package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text ingest faces: explicit-schema JSONL/TSV readers with quarantine.
  * The oracle-gated q_jsonl_scan/q_tsv_scan rows prove the CLEAN
  * round trip; this spec pins the failure path the corpus can't carry —
  * malformed lines must land in `_quarantine` with their raw text (never
  * kill the job, never silently drop) while the surrounding lines parse.
  */
class TextSourcesSpec extends SparkSpec {

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("textsources").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-00000.txt"),
      lines.mkString("\n") + "\n")
    dir
  }

  test("jsonl: malformed lines quarantine with raw text; neighbors parse") {
    val good = """{"event_id":1,"ts":"2024-01-08 00:00:00.123456","user_id":7,"event_type":"click","value":1.5,"props":"{\"k\": 3}"}"""
    val badJson = """{"event_id":2,"ts":"2024-01-08 oops"""
    val badType = """{"event_id":"not-a-number","ts":"2024-01-08 00:00:01.000000","user_id":8,"event_type":"view","value":2.0,"props":"{}"}"""
    val df = TextSources.eventsJsonl(spark, writeLines(Seq(good, badJson, badType)))

    // consume the dead-letter frame whole (sub-selecting raw_line alone
    // would re-prune the scan down to the corrupt column — unsupported)
    val bad = TextSources.deadLetter(df).collect().map(_.getString(0))
    assert(bad.toSet == Set(badJson, badType))

    val ok = TextSources.clean(df).collect()
    assert(ok.length == 1)
    val r = ok.head
    assert(r.getAs[Long]("event_id") == 1L)
    assert(r.getAs[java.sql.Timestamp]("ts").getTime == 1704672000123L)
    assert(r.getAs[String]("props") == """{"k": 3}""")
    // clean() restores the exact parquet-face schema
    assert(TextSources.clean(df).schema == TextSources.eventsSchema)
  }

  test("tsv: quarantine is required-column-relative; full-schema read is strict") {
    val good = "3\t2024-01-08 00:00:02.000001\t9\tclick\t4.25\t{\"k\": 5}"
    val shortRow = "4\t2024-01-08 00:00:03.000000\tclick"
    val badCell = "x\t2024-01-08 00:00:04.000000\t10\tview\t1.0\t{}"
    val df = TextSources.eventsTsv(spark, writeLines(Seq(good, shortRow, badCell)))

    // narrow dead-letter (raw_line + event_id): the short row's event_id
    // parses, so only the bad-cell row is flagged — Spark's CSV contract
    // judges malformedness against the columns actually read
    val bad = TextSources.deadLetter(df).collect().map(_.getString(0))
    assert(bad.toSet == Set(badCell))

    // the full-schema clean() reads every column, so BOTH defective rows
    // quarantine out and exactly the good row survives
    val ok = TextSources.clean(df).collect()
    assert(ok.length == 1)
    assert(ok.head.getAs[Long]("event_id") == 3L)
    assert(ok.head.getAs[Double]("value") == 4.25)

    // full-width audit: both defective raw lines visible when the flag
    // rides a projection of every data column
    val fullBad = df.select(col(TextSources.QuarantineCol),
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .filter(col(TextSources.QuarantineCol).isNotNull)
      .collect().map(_.getString(0))
    assert(fullBad.toSet == Set(shortRow, badCell))
  }

  test("round trip: serialize → read back is lossless for both faces") {
    import spark.implicits._
    val src = Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-08T01:02:03.123456Z")),
        5L, "click", 0.01, """{"k": 1}"""),
      (2L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-08T23:59:59.999999Z")),
        6L, "view", 490.02, """{"k": 2}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val jd = Files.createTempDirectory("rt-jsonl").toString
    TextSources.toJsonlColumns(src).coalesce(1).write.mode("overwrite").text(jd)
    val jBack = TextSources.clean(TextSources.eventsJsonl(spark, jd))
    assert(jBack.orderBy("event_id").collect().toSeq ==
      src.orderBy("event_id").collect().toSeq)

    val td = Files.createTempDirectory("rt-tsv").toString
    TextSources.toTsvColumns(src).coalesce(1).write.mode("overwrite").text(td)
    val tBack = TextSources.clean(TextSources.eventsTsv(spark, td))
    assert(tBack.orderBy("event_id").collect().toSeq ==
      src.orderBy("event_id").collect().toSeq)
  }
}
