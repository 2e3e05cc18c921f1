package graft.ext

import java.nio.file.Files

import graft.SparkSpec
import graft.model.WaveManifest
import org.apache.spark.sql.functions._
import scala.util.Random

/** The wave-layout + manifest contracts for the persisted dense index
  * (review r11 items 1–2): replay-idempotent appends, kill-and-resume,
  * and manifest-pinned snapshot serving that never mixes an in-flight
  * wave into a running serve. Mirrors the PostingIndex/IndexStream spec
  * pattern — one discipline for both persisted indexes.
  */
class IvfIndexWaveSpec extends SparkSpec {
  import spark.implicits._

  private def mkData(seed: Int, n: Int = 60) = {
    val rnd = new Random(seed)
    (0L until n.toLong).map { i =>
      (i, Array.fill(4)((rnd.nextFloat() - 0.5f) * 2f))
    }.toDF("vec_id", "embedding")
  }

  private def freshPath() = Files.createTempDirectory("ivf_wave_").toString

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "neighbor_id", "cosine", "rk")
    .as[(Long, Long, Double, Int)].collect().toSet

  private def serve(path: String, q: org.apache.spark.sql.DataFrame) =
    rows(IvfIndex.search(IvfIndex.load(spark, path), q,
      "vec_id", "embedding", k = 3, nProbe = 1))

  test("replayed append (same wave) replaces its wave, never doubles") {
    val data = mkData(41)
    val q = data.filter($"vec_id" < 4)
    val path = freshPath()
    IvfIndex.buildSign(data.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", bits = 2).save(path)
    val odd = IvfIndex.assignTo(IvfIndex.load(spark, path),
      data.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding")
      .localCheckpoint()
    IvfIndex.appendSave(path, odd, wave = 1L)
    val before = serve(path, q)
    IvfIndex.appendSave(path, odd, wave = 1L) // the recovery retry
    assert(serve(path, q) == before)
    // row-level proof: no neighbor is stored twice anywhere in the index
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.assigned.count() ==
      loaded.assigned.select("neighbor_id").distinct().count())
    // and the whole thing equals a one-shot full build
    val full = freshPath()
    IvfIndex.buildSign(data, "vec_id", "embedding", bits = 2).save(full)
    assert(serve(path, q) == serve(full, q) && before.nonEmpty)
  }

  test("kill-and-resume: garbage from a dying append is replaced, " +
      "and an uncommitted wave is invisible to pinned serves") {
    val data = mkData(43)
    val q = data.filter($"vec_id" < 4)
    val path = freshPath()
    IvfIndex.buildSign(data.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", bits = 2).save(path)
    val evenOnly = serve(path, q)
    // pre-seed GARBAGE where wave 1 will land — stands in for a partial
    // wave a dying run left behind BEFORE its manifest commit
    // (schema matches the stored layout exactly — cv is array<float>)
    Seq((999L, Array(9.0f, 9.0f, 9.0f, 9.0f), 9.0, 0))
      .toDF("neighbor_id", "cv", "cn", "list_id")
      .withColumn("batch", lit(1L))
      .write.partitionBy("batch", "list_id").mode("append")
      .parquet(s"$path/lists")
    // the manifest still pins {0}: the garbage wave does not exist to a
    // pinned serve (this is what the blind mode-append could not give)
    assert(serve(path, q) == evenOnly)
    // the recovery retry delivers wave 1 for real — garbage replaced
    IvfIndex.appendSave(path,
      IvfIndex.assignTo(IvfIndex.load(spark, path),
        data.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding"),
      wave = 1L)
    assert(IvfIndex.load(spark, path).assigned
      .filter($"neighbor_id" === 999L).count() == 0L)
    val full = freshPath()
    IvfIndex.buildSign(data, "vec_id", "embedding", bits = 2).save(full)
    assert(serve(path, q) == serve(full, q))
  }

  test("snapshot serving: a load pinned before an append answers " +
      "pre-append; a fresh load answers post-append; never a mix") {
    val data = mkData(47)
    val q = data.filter($"vec_id" < 4)
    val path = freshPath()
    IvfIndex.buildSign(data.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", bits = 2).save(path)
    // pin the snapshot FIRST (plan-time manifest resolution) …
    val pinnedModel = IvfIndex.load(spark, path)
    val preAppendPlan = IvfIndex.search(pinnedModel, q,
      "vec_id", "embedding", k = 3, nProbe = 1)
    // … then append a wave while that serve plan is outstanding
    IvfIndex.appendSave(path,
      IvfIndex.assignTo(pinnedModel,
        data.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding"),
      wave = 1L)
    // the outstanding serve executes AFTER the append, yet answers the
    // PRE-append snapshot (wave {0}) — the even-only build's answer
    val evenPath = freshPath()
    IvfIndex.buildSign(data.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", bits = 2).save(evenPath)
    assert(rows(preAppendPlan) == serve(evenPath, q))
    // a fresh load pins {0, 1} and answers the full corpus
    val fullPath = freshPath()
    IvfIndex.buildSign(data, "vec_id", "embedding", bits = 2).save(fullPath)
    assert(serve(path, q) == serve(fullPath, q))
    assert(serve(path, q) != rows(preAppendPlan)) // the two snapshots differ
    // time travel: version 0 still serves the pre-append answer
    assert(rows(IvfIndex.search(IvfIndex.load(spark, path, Some(0L)), q,
      "vec_id", "embedding", 3, 1)) == rows(preAppendPlan))
  }

  test("WaveManifest: versions, pointer, and replay-skip commitWave") {
    val root = freshPath()
    assert(WaveManifest.pinned(spark, root).isEmpty)
    assert(WaveManifest.latestVersion(spark, root).isEmpty)
    val v0 = WaveManifest.commit(spark, root, Seq(0L))
    assert(v0 == 0L && WaveManifest.pinned(spark, root).contains(Seq(0L)))
    WaveManifest.commitWave(spark, root, 3L)
    assert(WaveManifest.pinned(spark, root).contains(Seq(0L, 3L)))
    // replaying an already-pinned wave spins NO new version
    val nVersions = WaveManifest.versions(spark, root).size
    WaveManifest.commitWave(spark, root, 3L)
    assert(WaveManifest.versions(spark, root).size == nVersions)
    // time travel reads an old version's wave set verbatim
    assert(WaveManifest.wavesAt(spark, root, 0L) == Seq(0L))
    // wave lists are stored sorted + deduped
    WaveManifest.commit(spark, root, Seq(5L, 1L, 5L))
    assert(WaveManifest.pinned(spark, root).contains(Seq(1L, 5L)))
  }

  test("save over an appended index re-pins the manifest to wave {0}") {
    val data = mkData(53)
    val q = data.filter($"vec_id" < 4)
    val path = freshPath()
    IvfIndex.buildSign(data.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", bits = 2).save(path)
    IvfIndex.appendSave(path,
      IvfIndex.assignTo(IvfIndex.load(spark, path),
        data.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding"),
      wave = 1L)
    // rebuild from scratch on the full corpus: static overwrite of the
    // lists + manifest re-pin — no stale wave survives
    IvfIndex.buildSign(data, "vec_id", "embedding", bits = 2).save(path)
    val full = freshPath()
    IvfIndex.buildSign(data, "vec_id", "embedding", bits = 2).save(full)
    assert(serve(path, q) == serve(full, q))
    assert(IvfIndex.load(spark, path).assigned.count() == data.count())
  }

  test("pruned-probe plan contract holds on the wave layout: a probe " +
      "scans a strict subset of (batch, list) partitions across waves") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val data = mkData(59)
    val path = freshPath()
    IvfIndex.buildSign(data.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", bits = 2).save(path)
    IvfIndex.appendSave(path,
      IvfIndex.assignTo(IvfIndex.load(spark, path),
        data.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding"),
      wave = 1L)
    val q = IvfIndex.search(IvfIndex.load(spark, path),
      data.filter($"vec_id" === 0L), "vec_id", "embedding", 3, 1)
    q.collect()
    def leaves(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case qs: QueryStageExec => leaves(qs.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(leaves) ++
        other.subqueries.flatMap(leaves)
    }
    val listScan = leaves(q.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("lists")))
    assert(listScan.isDefined, "no file scan over the lists layout found")
    val numFiles = listScan.get.metrics("numFiles").value
    val allParts = Option(new java.io.File(s"$path/lists").listFiles())
      .getOrElse(Array()).filter(_.getName.startsWith("batch="))
      .flatMap(b => Option(b.listFiles()).getOrElse(Array()))
      .filter(_.getName.startsWith("list_id="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(numFiles >= 1 && numFiles < allParts,
      s"expected pruned scan, read $numFiles of $allParts part-files")
  }
}
