package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ext.PostingIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming index maintenance contracts: waves must serve exactly like
  * a one-shot batch build over the same documents, and a replayed
  * micro-batch must replace its own wave, never double it. */
class IndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private val allDocs = Seq(
    (1L, "spark join table scan fast"),
    (2L, "slow table scan table scan"),
    (3L, "spark spark join"),
    (4L, "nothing relevant here at all"),
    (5L, "join")).toDF("doc_id", "text")

  private val terms = Seq("spark", "table", "join")

  private def fresh() = Files.createTempDirectory("graft_istream_").toString

  private def served(path: String) =
    PostingIndex.scoreQuery(spark, path, terms, termBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (2 to 4).map(r.getLong), r.getDouble(5))).sortBy(_._1).toSeq

  private def batchBuilt(): Seq[(Long, Long, Seq[Long], Double)] = {
    val p = fresh()
    PostingIndex.build(allDocs, "doc_id", "text", p, termBuckets = 8)
    served(p)
  }

  test("streamed waves serve exactly like the one-shot batch build") {
    val path = fresh(); val ckpt = fresh()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = IndexStream.start(mem.toDS().toDF("doc_id", "text"),
      "doc_id", "text", path, ckpt, termBuckets = 8)
    try {
      mem.addData((1L, "spark join table scan fast"),
        (2L, "slow table scan table scan"))
      q.processAllAvailable()
      mem.addData((3L, "spark spark join"),
        (4L, "nothing relevant here at all"), (5L, "join"))
      q.processAllAvailable()
    } finally q.stop()
    assert(served(path) === batchBuilt())
  }

  test("replaying a wave replaces it — postings never double") {
    val path = fresh()
    val w1 = allDocs.filter($"doc_id" <= 2)
    val w2 = allDocs.filter($"doc_id" > 2)
    IndexStream.appendBatch(w1, "doc_id", "text", path, 0L, 8)
    IndexStream.appendBatch(w2, "doc_id", "text", path, 1L, 8)
    val before = served(path)
    IndexStream.appendBatch(w2, "doc_id", "text", path, 1L, 8) // replay
    assert(served(path) === before)
    assert(before === batchBuilt())
    // and the corpus stats did not inflate
    val n = spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs"))).collect().head.getDouble(0)
    assert(n === 5.0)
  }

  test("compacting a committed wave preserves serving bit-for-bit") {
    // waves are immutable once committed, which makes them compactable
    // with the standard slice compactor — doclens' batch=1 dir here
    // (streaming wave = batchId + 1, so batch id 0 lands as wave 1);
    // the rewritten slice must change nothing the scorer can see
    val path = fresh()
    IndexStream.appendBatch(allDocs.filter($"doc_id" <= 2).repartition(4),
      "doc_id", "text", path, 0L, 8)
    IndexStream.appendBatch(allDocs.filter($"doc_id" > 2),
      "doc_id", "text", path, 1L, 8)
    val before = served(path)
    val (nBefore, nAfter) = graft.sources.CorpusLayout.compactSlice(
      spark, s"$path/doclens", Seq("batch" -> "1"), sortCols = Seq("doc_id"))
    assert(nAfter <= nBefore && nAfter >= 1)
    assert(served(path) === before)
  }

  test("streaming into a BUILT index leaves the build wave intact " +
      "(wave = batchId + 1 — epoch 0 must not land on build wave 0)") {
    val path = fresh()
    PostingIndex.build(allDocs.filter($"doc_id" <= 2), "doc_id", "text",
      path, termBuckets = 8)
    // epoch ids start at 0: without the +1 this batch dynamically
    // overwrote wave 0's doclens/terms/stats partitions (docs 1–2 gone)
    // and its manifest commit silently skipped the already-pinned wave
    IndexStream.appendBatch(allDocs.filter($"doc_id" > 2),
      "doc_id", "text", path, 0L, 8)
    assert(served(path) === batchBuilt())
    val n = spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs"))).collect().head.getDouble(0)
    assert(n === 5.0)
  }

  test("a SECOND stream run with a fresh checkpoint slots past the " +
      "first run's waves instead of clobbering them") {
    val path = fresh()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def runOnce(data: Seq[(Long, String)]): Unit = {
      val mem = MemoryStream[(Long, String)]
      mem.addData(data: _*)
      val q = IndexStream.start(mem.toDS().toDF("doc_id", "text"),
        "doc_id", "text", path, fresh(), termBuckets = 8)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(Seq((1L, "spark join table scan fast"),
      (2L, "slow table scan table scan")))
    // fresh checkpoint → epoch ids restart at 0; without the run-scoped
    // base this run's wave 1 dynamically overwrote run 1's postings
    runOnce(Seq((3L, "spark spark join"),
      (4L, "nothing relevant here at all"), (5L, "join")))
    assert(served(path) === batchBuilt())
    val n = spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs"))).collect().head.getDouble(0)
    assert(n === 5.0)
  }

  test("a micro-batch arriving AFTER an auto-compaction does not " +
      "clobber the compacted wave (disjoint compaction id space)") {
    val path = fresh()
    // compactEvery = 2: the second batch triggers compaction of waves
    // {1, 2} into a CompactBase-space wave; the third batch's wave 3
    // must neither be skipped by the watermark nor overwrite the
    // compacted wave's partitions (the pre-fix failure: newWave =
    // pinned.max + 1 was exactly the next batch's id)
    IndexStream.appendBatch(allDocs.filter($"doc_id" <= 2),
      "doc_id", "text", path, 0L, 8, compactEvery = 2)
    IndexStream.appendBatch(allDocs.filter($"doc_id" === 3L),
      "doc_id", "text", path, 1L, 8, compactEvery = 2)
    val pinnedAfter = graft.model.WaveManifest.pinned(spark, path).get
    assert(pinnedAfter === Seq(graft.model.WaveManifest.CompactBase))
    IndexStream.appendBatch(allDocs.filter($"doc_id" > 3),
      "doc_id", "text", path, 2L, 8, compactEvery = 2)
    assert(served(path) === batchBuilt())
    val n = spark.read.parquet(s"$path/stats")
      .filter(col("batch").isin(graft.model.WaveManifest
        .pinned(spark, path).get.map(Long.box): _*))
      .agg(sum(col("n_docs"))).collect().head.getDouble(0)
    assert(n === 5.0)
  }

  test("serving stays pruned to the query's buckets on the wave layout") {
    val path = fresh()
    IndexStream.appendBatch(allDocs, "doc_id", "text", path, 0L, 8)
    val q = PostingIndex.scoreQuery(spark, path, Seq("spark"),
      termBuckets = 8)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // a single-term query prunes to ONE bucket — Spark prints that as
    // an equality, not an IN list
    assert("PartitionFilters: \\[[^\\]]*bucket#\\d+ (IN|=)".r
      .findFirstIn(plan).isDefined,
      s"no bucket pruning on the wave layout:\n${plan.take(800)}")
  }
}
