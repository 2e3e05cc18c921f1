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
}
