package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.ext.IvfIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming face of the persisted dense index: micro-batch waves land
  * via the same shared write path as batch appends, replay under the
  * same id replaces rather than doubles, and the recovered index serves
  * exactly like a one-shot build — the [[IndexStreamRecoverySpec]]
  * posture for vectors.
  */
class VectorIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def writeVec(dir: String, name: String, id: Long,
      v: Seq[Float]): Unit =
    Files.write(Paths.get(dir, name),
      s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}\n""".getBytes)

  private def mkData(n: Int) = {
    val rnd = new scala.util.Random(61)
    (0L until n.toLong).map { i =>
      (i, Array.fill(4)((rnd.nextFloat() - 0.5f) * 2f))
    }
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "neighbor_id", "cosine", "rk")
    .as[(Long, Long, Double, Int)].collect().toSet

  test("streamed waves ≡ one-shot build; crash mid-stream replays " +
      "its wave idempotently") {
    val data = mkData(24)
    val base = data.filter(_._1 < 12) // the built (wave 0) half
    val streamed = data.filter(_._1 >= 12) // arrives via the stream
    val inDir = Files.createTempDirectory("vstream-in").toString
    val ckpt = Files.createTempDirectory("vstream-ckpt").toString
    val path = Files.createTempDirectory("vstream-idx").toString
    IvfIndex.buildSign(base.toDF("vec_id", "embedding"),
      "vec_id", "embedding", bits = 2).save(path)
    streamed.zipWithIndex.foreach { case ((id, v), i) =>
      writeVec(inDir, s"v$i.json", id, v.toSeq)
    }

    @volatile var crashed = false
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4).json(inDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          VectorIndexStream.appendBatch(batch, "vec_id", "embedding",
            path, id)
          // crash AFTER the wave landed but BEFORE the batch commits:
          // the worst replay case — a complete wave that must be
          // overwritten identically, not doubled
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
    run() // restart: batch 1 replays under the same id, rest follow

    val all = data.toDF("vec_id", "embedding")
    val queries = all.filter($"vec_id".isin(0L, 13L, 23L))
    val served = rows(VectorIndexStream.serve(spark, path, queries,
      "vec_id", "embedding", k = 3, nProbe = 1))
    val oneShot = Files.createTempDirectory("vstream-full").toString
    IvfIndex.buildSign(all, "vec_id", "embedding", bits = 2).save(oneShot)
    assert(served == rows(IvfIndex.search(IvfIndex.load(spark, oneShot),
      queries, "vec_id", "embedding", 3, 1)) && served.nonEmpty)
    // no vector stored twice anywhere (the double-write corruption the
    // wave layout exists to prevent)
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.assigned.count() ==
      loaded.assigned.select("neighbor_id").distinct().count())
    assert(loaded.assigned.count() == data.size.toLong)
  }

  test("a batch arriving AFTER an auto-compaction keeps every " +
      "pre-compaction vector (disjoint compaction id space)") {
    val data = mkData(24)
    val path = Files.createTempDirectory("vstream-cmp").toString
    IvfIndex.buildSign(data.filter(_._1 < 8).toDF("vec_id", "embedding"),
      "vec_id", "embedding", bits = 2).save(path)
    // batch 0 → wave 1; pinned {0, 1} hits compactEvery = 2 → compaction
    // into the CompactBase space; batch 1 → wave 2 must pass the
    // watermark AND not overwrite the compacted wave's list partitions
    VectorIndexStream.appendBatch(
      data.filter(x => x._1 >= 8 && x._1 < 16).toDF("vec_id", "embedding"),
      "vec_id", "embedding", path, 0L, compactEvery = 2)
    assert(graft.model.WaveManifest.pinned(spark, path).get ===
      Seq(graft.model.WaveManifest.CompactBase))
    VectorIndexStream.appendBatch(
      data.filter(_._1 >= 16).toDF("vec_id", "embedding"),
      "vec_id", "embedding", path, 1L, compactEvery = 2)
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.assigned.count() == data.size.toLong)
    assert(loaded.assigned.count() ==
      loaded.assigned.select("neighbor_id").distinct().count())
  }
}
