package graft.sources

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property gate: the JSONL face round-trips ARBITRARY field content —
  * control characters, tabs, newlines, quotes, non-ASCII — because JSON
  * escapes everything (`to_json` on write, Jackson on read). This is the
  * reason the JSONL face is the default text format for corpus-bearing
  * columns; the TSV face documents its flow-log precondition instead
  * (no delimiter/newline bytes inside fields — TSVs cannot carry them
  * unescaped, which the generator-shaped spec covers).
  * Random strings via fixed-seed manual sampling (no scalatest-plus
  * bridge in the build).
  */
class TextSourcesPropertySpec extends SparkSpec {
  import spark.implicits._

  // strings drawn from a hostile alphabet: JSON metacharacters, the TSV
  // delimiter, newlines, unicode beyond the BMP boundary region
  // (BMP-only: a lone surrogate half is not valid UTF-8 and would be
  // replaced on write — that is a filesystem-encoding fact, not a
  // round-trip defect)
  private val hostileChar = Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('"', '\\', '\t', '\n', '\r', '{', '}', ','),
    Gen.oneOf('é', 'ß', '中', ' '))
  private val hostileStr = Gen.choose(0, 12)
    .flatMap(n => Gen.listOfN(n, hostileChar).map(_.mkString))

  private val rowGen = for {
    id <- Gen.choose(0L, 1000000L)
    us <- Gen.choose(0L, 4102444800000000L) // instants through 2100, µs
    uid <- Gen.choose(0L, 99999L)
    et <- hostileStr
    v <- Gen.oneOf(Gen.choose(-1e6, 1e6), Gen.oneOf(0.0, -0.0, 1e-300))
    props <- hostileStr
  } yield (id, java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS)),
    uid, et, v, props)

  private def sample(i: Int): List[(Long, java.sql.Timestamp, Long, String, Double, String)] =
    Gen.listOfN(30, rowGen)(Gen.Parameters.default, Seed(11L + i))
      .getOrElse(Nil)
      // event_id is the round-trip join key — make it unique per row
      .zipWithIndex.map { case ((_, ts, uid, et, v, p), j) =>
        (j.toLong, ts, uid, et, v, p) }

  test("jsonl face round-trips hostile field content losslessly") {
    (0 until 5).foreach { i =>
      val rows = sample(i)
      val src = rows.toDF("event_id", "ts", "user_id", "event_type",
        "value", "props")
      val dir = Files.createTempDirectory(s"jsonl-prop-$i").toString
      TextSources.toJsonlColumns(src).coalesce(1)
        .write.mode("overwrite").text(dir)
      val back = TextSources.clean(TextSources.eventsJsonl(spark, dir))
        .as[(Long, java.sql.Timestamp, Long, String, Double, String)]
        .collect().sortBy(_._1).toList
      assert(back == rows, s"seed $i")
    }
  }

  test("tsv face: NULL middle fields keep column alignment (no left-shift)") {
    // ADVICE r9: concat_ws silently SKIPS nulls — a NULL event_type row
    // used to serialize with one fewer tab, and the CSV reader would
    // parse the shifted row "successfully" into the wrong columns.
    // Now NULL serializes as the empty field and reads back as NULL,
    // with every later column in its right slot.
    val rows = Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-02T03:04:05.123456Z")),
        7L, Option("click"), Option(1.5), Option("""{"k":1}""")),
      (2L, java.sql.Timestamp.from(java.time.Instant.parse("2024-02-03T04:05:06.654321Z")),
        8L, Option.empty[String], Option(2.5), Option("""{"k":2}""")),
      (3L, java.sql.Timestamp.from(java.time.Instant.parse("2024-03-04T05:06:07.000001Z")),
        9L, Option("view"), Option.empty[Double], Option.empty[String]))
    val src = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    // fixed tab arity regardless of nulls
    val lines = TextSources.toTsvColumns(src).as[String].collect()
    assert(lines.forall(_.count(_ == '\t') == 5), lines.mkString("|"))
    val dir = Files.createTempDirectory("tsv-null-prop").toString
    TextSources.toTsvColumns(src).coalesce(1)
      .write.mode("overwrite").text(dir)
    val back = TextSources.clean(TextSources.eventsTsv(spark, dir))
      .as[(Long, java.sql.Timestamp, Long, Option[String], Option[Double], Option[String])]
      .collect().sortBy(_._1).toList
    assert(back == rows.toList)
  }
}
