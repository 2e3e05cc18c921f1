package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.TextSources

/** Continuous text ingest (§2.10 meets S1/S2): the JSONL stream face must
  * (1) parse arriving files with the exact batch-face schema, quarantine
  * included, and (2) be CHECKPOINT-INCREMENTAL — a restart consumes only
  * files that arrived since the last run. (2) is the 100 TB ingest
  * contract: a landing zone with millions of historical files must never
  * be re-read because the reader restarted.
  */
class StreamingTextIngestSpec extends SparkSpec {

  private def writeFile(dir: String, name: String, lines: Seq[String]): Unit =
    Files.writeString(Paths.get(s"$dir/$name"), lines.mkString("\n") + "\n")

  private def drain(inDir: String, ckpt: String): Seq[(Long, String)] = {
    val captured = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val stream = TextSources.eventsJsonlStream(spark, inDir)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // route exactly like production: clean rows forward, bad rows out
        captured ++= TextSources.clean(batch)
          .select(col("event_id"), col("event_type"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
        captured ++= TextSources.deadLetter(batch)
          .collect().map(r => (-1L, r.getString(0)))
        ()
      }
      .start()
    q.awaitTermination(60000)
    captured.toSeq
  }

  test("jsonl stream parses arriving files and resumes incrementally") {
    val inDir = Files.createTempDirectory("stream-jsonl-in").toString
    val ckpt = Files.createTempDirectory("stream-jsonl-ckpt").toString

    writeFile(inDir, "a.json", Seq(
      """{"event_id":1,"ts":"2024-01-08 00:00:00.000001","user_id":7,"event_type":"click","value":1.5,"props":"{}"}""",
      """{"event_id":2,"ts":"not a time"""))
    val first = drain(inDir, ckpt)
    assert(first.toSet == Set(
      (1L, "click"),
      (-1L, """{"event_id":2,"ts":"not a time""")))

    // second run, same checkpoint: ONLY the new file is consumed
    writeFile(inDir, "b.json", Seq(
      """{"event_id":3,"ts":"2024-01-08 00:00:02.000000","user_id":8,"event_type":"view","value":2.0,"props":"{}"}"""))
    val second = drain(inDir, ckpt)
    assert(second == Seq((3L, "view")), s"re-read old files: $second")

    // third run with nothing new: zero rows, zero reprocessing
    assert(drain(inDir, ckpt).isEmpty)
  }
}
