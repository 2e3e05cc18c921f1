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

  test("crash after batch N commit: restart re-delivers only the failed batch") {
    // Exactly-once posture, pinned: the file source tracks consumed
    // files in the checkpoint WAL, so a committed batch is never
    // re-read; the batch that was in flight when the process died is
    // re-delivered to foreachBatch UNDER THE SAME batchId — sink-side
    // delivery is at-least-once, and (batchId, content) identity is the
    // idempotency key a production sink dedups on. End-to-end
    // exactly-once = checkpointed source + idempotent sink.
    val inDir = Files.createTempDirectory("stream-crash-in").toString
    val ckpt = Files.createTempDirectory("stream-crash-ckpt").toString
    def line(id: Long): String =
      s"""{"event_id":$id,"ts":"2024-01-08 00:00:0$id.000000","user_id":$id,"event_type":"e$id","value":1.0,"props":"{}"}"""
    writeFile(inDir, "a.json", Seq(line(1)))
    writeFile(inDir, "b.json", Seq(line(2)))
    writeFile(inDir, "c.json", Seq(line(3)))

    val calls = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    @volatile var crashed = false
    def run(): Unit = {
      val q = TextSources.eventsJsonlStream(spark, inDir, maxFilesPerTrigger = 1)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val ids = TextSources.clean(batch)
            .select(col("event_id")).collect().map(_.getLong(0)).toSet
          calls += ((batchId, ids)) // capture BEFORE the crash: the
          // in-flight delivery is visible, so the replay is observable
          if (batchId == 1 && !crashed) {
            crashed = true
            throw new RuntimeException("simulated crash before batch commit")
          }
          ()
        }
        .start()
      try q.awaitTermination(60000)
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          assert(e.getMessage.contains("simulated crash"), e.getMessage)
      }
    }

    run() // dies mid-batch-1: batch 0 committed, batch 1 uncommitted
    assert(crashed)
    assert(calls.map(_._1).toSeq == Seq(0L, 1L), calls.toSeq)

    run() // restart from the checkpoint
    // batch 0 is NOT re-delivered (committed); batch 1 replays under the
    // SAME id with the SAME content; batch 2 then completes the backlog
    assert(calls.map(_._1).toSeq == Seq(0L, 1L, 1L, 2L), calls.toSeq)
    val byBatch = calls.groupBy(_._1)
    assert(byBatch(1L).map(_._2).distinct.size == 1,
      s"replayed batch 1 content differs: ${byBatch(1L)}")
    // no loss, no dup beyond the replayed in-flight batch: the distinct
    // union equals the batch face over the same directory
    val batchFace = TextSources.clean(TextSources.eventsJsonl(spark, inDir))
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(calls.flatMap(_._2).toSet == batchFace)
    assert(calls.map(_._2.size).sum == batchFace.size + byBatch(1L).head._2.size)
  }
}
