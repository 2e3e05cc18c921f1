package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.ext.PostingIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Kill-and-resume posture for the streamed posting index, pinned the
  * way StreamingTextIngestSpec pins the ingest reader: a committed
  * wave is never re-read; the in-flight batch replays under the SAME
  * id, and because waves land via dynamic partition overwrite the
  * replay REPLACES whatever the dying run left — full wave, partial
  * wave, or garbage — so the recovered index serves exactly like a
  * one-shot build.
  */
class IndexStreamRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def writeDoc(dir: String, name: String, id: Long,
      text: String): Unit =
    Files.write(Paths.get(dir, name),
      s"""{"doc_id":$id,"text":"$text"}\n""".getBytes)

  test("crash mid-stream: restart overwrites the in-flight wave and " +
      "serves like a one-shot build") {
    val inDir = Files.createTempDirectory("istream-crash-in").toString
    val ckpt = Files.createTempDirectory("istream-crash-ckpt").toString
    val path = Files.createTempDirectory("istream-crash-idx").toString
    writeDoc(inDir, "a.json", 1L, "spark join table scan fast")
    writeDoc(inDir, "b.json", 2L, "slow table scan table scan")
    writeDoc(inDir, "c.json", 3L, "spark spark join")

    // pre-seed GARBAGE where batch 1's doclens wave will land — stands
    // in for a partial wave a dying run left behind; the real delivery
    // must replace it, not merge with it
    Seq((999L, 999L)).toDF("doc_id", "dl").withColumn("batch", lit(1L))
      .write.partitionBy("batch").mode("append")
      .parquet(s"$path/doclens")

    @volatile var crashed = false
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          IndexStream.appendBatch(batch, "doc_id", "text", path, id, 8)
          // crash AFTER the wave is fully written but BEFORE the batch
          // commits: the worst replay case — a complete wave that must
          // be overwritten identically, not doubled
          if (id == 1 && !crashed) {
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

    run() // dies after batch 1's wave landed, batch 1 uncommitted
    assert(crashed)
    run() // restart: batch 1 replays under the same id, batch 2 follows

    val terms = Seq("spark", "table", "join")
    def rows(p: String) =
      PostingIndex.scoreQuery(spark, p, terms, termBuckets = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          (2 to 4).map(r.getLong), r.getDouble(5))).sortBy(_._1).toSeq
    val oneShot = Files.createTempDirectory("istream-crash-full").toString
    PostingIndex.build(Seq(
        (1L, "spark join table scan fast"),
        (2L, "slow table scan table scan"),
        (3L, "spark spark join")).toDF("doc_id", "text"),
      "doc_id", "text", oneShot, termBuckets = 8)
    assert(rows(path) === rows(oneShot))
    // the garbage partial wave is gone, not merged
    val dl999 = spark.read.parquet(s"$path/doclens")
      .filter(col("doc_id") === 999L).count()
    assert(dl999 === 0L)
  }

  test("pre-upgrade checkpoint replay: a batch already committed under " +
      "the old un-shifted mapping is skipped, not double-landed") {
    val path = Files.createTempDirectory("istream-upg-idx").toString
    val b0 = Seq((1L, "spark join table scan fast"),
      (2L, "slow table scan table scan")).toDF("doc_id", "text")
    // PRE-upgrade run: batch 0 lands directly as wave 1 (no run base)
    // and its data commits — but the checkpoint "dies" before recording
    // the batch, the exact at-least-once gap the migration hazard needs
    IndexStream.appendBatch(b0, "doc_id", "text", path, 0L, 8)
    assert(graft.model.WaveManifest.pinned(spark, path).get === Seq(1L))

    // POST-upgrade restart from that checkpoint: the run-scoped base
    // resolves past the pinned wave, and the replayed epoch 0 would
    // land the same docs AGAIN as wave base+1 — the guard must see
    // wave 1 pinned with exactly this doc set and skip
    val base = DedupState.indexRunBase(spark, path)
    assert(base >= 1L)
    IndexStream.appendBatchGuarded(b0, "doc_id", "text", path,
      rawEpochId = 0L, base = base, termBuckets = 8)
    assert(graft.model.WaveManifest.pinned(spark, path).get === Seq(1L))

    // a genuinely NEW batch from the upgraded run lands normally under
    // the shifted mapping (old wave 2 is unpinned -> no skip)
    val b1 = Seq((3L, "spark spark join")).toDF("doc_id", "text")
    IndexStream.appendBatchGuarded(b1, "doc_id", "text", path,
      rawEpochId = 1L, base = base, termBuckets = 8)
    assert(graft.model.WaveManifest.pinned(spark, path).get ===
      Seq(1L, base + 2L))

    // df/stats identical to a one-shot build: nothing double-counted
    val oneShot = Files.createTempDirectory("istream-upg-full").toString
    PostingIndex.build(Seq(
        (1L, "spark join table scan fast"),
        (2L, "slow table scan table scan"),
        (3L, "spark spark join")).toDF("doc_id", "text"),
      "doc_id", "text", oneShot, termBuckets = 8)
    val terms = Seq("spark", "table", "join")
    def rows(p: String) =
      PostingIndex.scoreQuery(spark, p, terms, termBuckets = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          (2 to 4).map(r.getLong), r.getDouble(5))).sortBy(_._1).toSeq
    assert(rows(path) === rows(oneShot))

    // a batch that merely SHARES ids with the old wave is NOT treated
    // as a pre-upgrade replay (exact set equality, both directions)
    val partial = Seq((1L, "x"), (9L, "y")).toDF("doc_id", "text")
    assert(!IndexStream.alreadyLandedPreUpgrade(spark, path, 1L,
      partial, "doc_id"))
    val subset = Seq((1L, "x")).toDF("doc_id", "text")
    assert(!IndexStream.alreadyLandedPreUpgrade(spark, path, 1L,
      subset, "doc_id"))
  }

  test("pre-upgrade guard tolerates a pinned wave with NO doclens dir " +
      "(tombstone-only / empty-batch wave): false, not a corrupted-" +
      "index crash") {
    val path = Files.createTempDirectory("istream-upg-nodl").toString
    // a wave can be pinned with no doclens `batch=` dir at all — a
    // tombstone-only wave sharing the wave space, or a wave committed
    // from an empty micro-batch (dynamic overwrite writes no partition
    // dir). Pin such a wave directly:
    graft.model.WaveManifest.commitWave(spark, path, 1L)
    assert(graft.model.WaveManifest.pinned(spark, path).get === Seq(1L))

    val b0 = Seq((1L, "spark join table scan fast")).toDF("doc_id", "text")
    // pre-fix this threw readWaves' require("none of the pinned waves
    // ... has landed"); the contract is FALSE → proceed with the
    // normal shifted write (advice r16, medium)
    assert(!IndexStream.alreadyLandedPreUpgrade(spark, path, 1L,
      b0, "doc_id"))
    IndexStream.appendBatchGuarded(b0, "doc_id", "text", path,
      rawEpochId = 0L, base = 1L, termBuckets = 8)
    assert(graft.model.WaveManifest.pinned(spark, path).get ===
      Seq(1L, 2L))
  }
}
