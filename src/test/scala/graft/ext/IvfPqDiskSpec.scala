package graft.ext

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** The persisted IVF-PQ face under the shared WaveManifest discipline:
  * pruned serving ≡ the in-memory serve, replay-idempotent appends,
  * pinned-snapshot isolation, and compaction that preserves answers —
  * the IvfIndexWaveSpec contracts replayed on the code table. */
class IvfPqDiskSpec extends SparkSpec {
  import spark.implicits._

  private def mkData(seed: Int, n: Int = 60) = {
    val rnd = new Random(seed)
    (0L until n.toLong).map { i =>
      (i, Array.fill(4)((rnd.nextFloat() - 0.5f) * 2f))
    }.toDF("vec_id", "embedding")
  }

  private def freshPath() = Files.createTempDirectory("ivfpq_").toString

  private def train(data: org.apache.spark.sql.DataFrame) =
    IvfPq.train(data, "vec_id", "embedding",
      nLists = 3, coarseRounds = 2, m = 2, k = 4, pqRounds = 2)

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "neighbor_id", "adc_sqdist", "rk")
    .as[(Long, Long, Long, Int)].collect().toSet

  private def serve(path: String, q: org.apache.spark.sql.DataFrame) =
    rows(IvfPq.searchPruned(IvfPq.load(spark, path), q,
      "vec_id", "embedding", k = 3, nProbe = 2))

  test("save/load round-trip: pruned serving equals the in-memory " +
      "serve, and the code scan prunes to the probed partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val data = mkData(61)
    val q = data.filter($"vec_id" < 3)
    val model = train(data)
    val codes = IvfPq.encode(data, "vec_id", "embedding", model)
    val path = freshPath()
    IvfPq.save(model, codes, path)
    val mem = rows(IvfPq.adcTopK(codes, model, q,
      "vec_id", "embedding", k = 3, nProbe = 2))
    assert(rows(IvfPq.searchPruned(IvfPq.load(spark, path), q,
      "vec_id", "embedding", k = 3, nProbe = 2)) === mem && mem.nonEmpty)
    // partition-pruning contract on a one-query serve: nProbe=2 of 3
    // lists → the codes scan must read a strict subset of part-files
    val disk = IvfPq.searchPruned(IvfPq.load(spark, path),
      data.filter($"vec_id" === 0L), "vec_id", "embedding",
      k = 3, nProbe = 2)
    disk.collect()
    def leaves(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case qs: QueryStageExec => leaves(qs.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(leaves) ++
        other.subqueries.flatMap(leaves)
    }
    val codeScan = leaves(disk.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("codes")))
    assert(codeScan.isDefined, "no file scan over the codes layout found")
    val allParts = Option(new java.io.File(s"$path/codes").listFiles())
      .getOrElse(Array()).filter(_.getName.startsWith("batch="))
      .flatMap(b => Option(b.listFiles()).getOrElse(Array()))
      .filter(_.getName.startsWith("list_id="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    val numFiles = codeScan.get.metrics("numFiles").value
    assert(numFiles >= 1 && numFiles < allParts,
      s"expected pruned scan, read $numFiles of $allParts part-files")
  }

  test("append wave: replay-idempotent, and a pre-append handle keeps " +
      "serving the pre-append snapshot") {
    val data = mkData(67)
    val q = data.filter($"vec_id" < 3)
    val model = train(data.filter($"vec_id" % 2 === 0))
    val path = freshPath()
    IvfPq.save(model,
      IvfPq.encode(data.filter($"vec_id" % 2 === 0),
        "vec_id", "embedding", model), path)
    val before = serve(path, q)
    val preAppend = IvfPq.load(spark, path) // pinned BEFORE the append
    val odd = IvfPq.encode(data.filter($"vec_id" % 2 =!= 0),
      "vec_id", "embedding", model).localCheckpoint()
    IvfPq.appendSave(path, odd, wave = 1L)
    val after = serve(path, q)
    assert(after !== before, "append should change the served top-k")
    // the pre-append pin still answers the pre-append snapshot
    assert(rows(IvfPq.searchPruned(preAppend, q,
      "vec_id", "embedding", k = 3, nProbe = 2)) === before)
    // the recovery retry replaces wave 1, never doubles it
    IvfPq.appendSave(path, odd, wave = 1L)
    assert(serve(path, q) === after)
    val loaded = IvfPq.load(spark, path)
    assert(loaded.codes.select("vid").distinct().count() * 2 ===
      loaded.codes.count(), "a neighbor's codes are stored twice")
  }

  test("compact preserves answers bit-identically and burns absorbed " +
      "wave ids") {
    val data = mkData(71)
    val q = data.filter($"vec_id" < 3)
    val model = train(data.filter($"vec_id" % 3 === 0))
    val path = freshPath()
    IvfPq.save(model,
      IvfPq.encode(data.filter($"vec_id" % 3 === 0),
        "vec_id", "embedding", model), path)
    IvfPq.appendSave(path,
      IvfPq.encode(data.filter($"vec_id" % 3 === 1),
        "vec_id", "embedding", model).localCheckpoint(), wave = 1L)
    val before = serve(path, q)
    IvfPq.compact(spark, path)
    assert(serve(path, q) === before)
    // absorbed stream-space ids are refused loudly
    val ex = intercept[IllegalArgumentException] {
      IvfPq.appendSave(path,
        IvfPq.encode(data.filter($"vec_id" % 3 === 2),
          "vec_id", "embedding", model).localCheckpoint(), wave = 1L)
    }
    assert(ex.getMessage.contains("watermark"))
    // a fresh id above the watermark still lands
    IvfPq.appendSave(path,
      IvfPq.encode(data.filter($"vec_id" % 3 === 2),
        "vec_id", "embedding", model).localCheckpoint(), wave = 2L)
    val full = freshPath()
    IvfPq.save(model,
      IvfPq.encode(data, "vec_id", "embedding", model), full)
    assert(serve(path, q) === serve(full, q))
  }
}
