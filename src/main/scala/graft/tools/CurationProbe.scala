package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.ops.Expectations
import graft.streaming.CurationStream

/** Per-batch overhead of the streamed end-to-end curation pipeline
  * (review r15 #6's PERF note): streams the sf documents corpus
  * file-by-file through [[CurationStream]] (quality gate → persisted
  * near-dup filter → posting-index append) and compares against the
  * ONE-SHOT batch build over the same survivor corpus —
  *
  *   per-batch overhead ≈ (streamed wall − one-shot wall) / batches
  *
  * — i.e. what each micro-batch pays for the streaming machinery: the
  * checkpoint commit, two wave-manifest commits (dedup index + posting
  * index), the per-wave parquet write amplification, and the audit
  * action. Not part of the library surface; run manually:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *     sbt "runMain graft.tools.CurationProbe [batches]"
  */
object CurationProbe {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val nBatches = args.headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = Files.createTempDirectory("curation-probe").toString
    val inDir = s"$work/in"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // micro-batch split by doc_id range — one JSON file per batch, so
    // maxFilesPerTrigger=1 drives exactly nBatches triggers
    val ids = docs.agg(min("doc_id"), max("doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val span = (hi - lo) / nBatches + 1
    (0 until nBatches).foreach { b =>
      docs.filter(col("doc_id").between(lo + b * span,
          lo + (b + 1) * span - 1))
        .coalesce(1).write.json(s"$inDir/b$b")
    }
    val files = new java.io.File(inDir).listFiles().flatMap(d =>
      d.listFiles().filter(_.getName.endsWith(".json")))
    val flat = s"$work/flat"
    Files.createDirectory(java.nio.file.Paths.get(flat))
    files.zipWithIndex.foreach { case (f, i) =>
      Files.copy(f.toPath, java.nio.file.Paths.get(flat, f"b$i%03d.json"))
    }

    val rules = Seq(Expectations.notNull("text"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))

    // ── streamed: real stream engine, one file per trigger. One
    //    untimed warm-up pass into throwaway dirs (JIT, codegen and
    //    parquet-committer caches dominate a cold first batch), then
    //    the timed pass — the Bench discipline.
    def streamed(tag: String): Int = {
      var batches = 0
      val q = CurationStream.start(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(flat),
        "doc_id", "text", rules,
        dedupPath = s"$work/dd$tag/idx", indexPath = s"$work/pi$tag/idx",
        checkpoint = s"$work/ckpt$tag",
        onSurvivors = (_, _) => batches += 1,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
      batches
    }
    streamed("w")
    val (batches, streamedSec) = time(streamed(""))

    // ── one-shot: the batch faces over the whole corpus at once — the
    //    same gate audit, ONE near-dup pass (build, no incremental
    //    filter), ONE posting build
    val (_, oneShotSec) = time {
      val all = spark.read.schema(schema).json(flat)
      val report = Expectations.audit(all, rules).collect()
      require(report.forall(_.getAs[Boolean]("pass")))
      val emptyIdx = graft.ext.Dedup.minhashIndex(all.limit(0),
        "doc_id", "text", shingleN = 3, numHashes = 12)
      val surv = graft.streaming.StreamingNearDup.filterBatch(
        emptyIdx, all, "doc_id", "text",
        shingleN = 3, numHashes = 12, bandSize = 4, threshold = 0.7)
      graft.ext.PostingIndex.build(surv, "doc_id", "text",
        s"$work/pi1/idx")
    }

    // ── direct-drive pass: the SAME batch bodies (audit → near-dup →
    //    posting append, same accumulation order) called directly,
    //    without the streaming engine — isolates the engine's
    //    per-trigger machinery (offset WAL, commit log, microbatch
    //    planning, file-source listing) from the batch body the
    //    library owns
    val batchFrames = (0 until batches).map { i =>
      spark.read.schema(schema).json(f"$flat/b$i%03d.json")
        .localCheckpoint()
    }
    val (_, directSec) = time {
      batchFrames.zipWithIndex.foreach { case (b, i) =>
        CurationStream.processBatch(b, i.toLong, "doc_id", "text", rules,
          s"$work/ddD/idx", s"$work/piD/idx", dedupBase = 0L,
          postBase = 0L, quarantine = (_, _, _) => (),
          onSurvivors = (_, _) => (), termBuckets = 64, shingleN = 3,
          numHashes = 12, bandSize = 4, threshold = 0.7)
      }
    }

    // ── raw manifest-commit cost: the engine's own consistency
    //    primitive, isolated (tmp-write + hard-link publish, FS
    //    metadata only — no Spark job)
    val commitRoot = s"$work/commitprobe"
    val (_, commitSec) = time {
      (1L to 50L).foreach(w =>
        graft.model.WaveManifest.commitWave(spark, commitRoot, w))
    }

    val perBatch = (streamedSec - oneShotSec) / batches
    val bodyPer = directSec / batches
    val enginePer = (streamedSec - directSec) / batches
    println(f"""{"probe":"curation_overhead","sf_dir":"$sfDir",""" +
      f""""batches":$batches,"streamed_sec":$streamedSec%.2f,""" +
      f""""one_shot_sec":$oneShotSec%.2f,""" +
      f""""per_batch_overhead_sec":$perBatch%.3f,""" +
      f""""direct_body_sec":$directSec%.2f,""" +
      f""""per_batch_body_sec":$bodyPer%.3f,""" +
      f""""per_batch_engine_sec":$enginePer%.3f,""" +
      f""""manifest_commit_ms":${commitSec * 1000 / 50}%.2f}""")
    spark.stop()
  }
}
