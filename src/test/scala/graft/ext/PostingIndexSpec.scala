package graft.ext

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PostingIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join table scan fast"),
    (2L, "slow table scan table scan"),
    (3L, "spark spark join"),
    (4L, "nothing relevant here at all"),
    (5L, "join")).toDF("doc_id", "text")

  private def freshPath() =
    Files.createTempDirectory("graft_pidx_").toString

  test("index-then-serve equals the scan scorer bit-for-bit") {
    val path = freshPath()
    PostingIndex.build(docs, "doc_id", "text", path, termBuckets = 8)
    val terms = Seq("spark", "table", "join")
    val served = PostingIndex.scoreQuery(spark, path, terms, termBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (2 to 4).map(r.getLong), r.getDouble(5))).sortBy(_._1).toSeq
    val scanned = Relevance.bm25(docs, "doc_id", "text", terms)
      .filter(col("tf_0") > 0 || col("tf_1") > 0 || col("tf_2") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (2 to 4).map(r.getLong), r.getDouble(5))).sortBy(_._1).toSeq
    assert(served === scanned) // exact doubles, not approximate
    assert(served.map(_._1) === Seq(1L, 2L, 3L, 5L)) // doc 4 untouched
  }

  test("df/stats come from the FULL corpus, not the matching slice") {
    // two queries over the same index must agree on shared terms'
    // contributions: idf('join') depends on all 5 docs either way
    val path = freshPath()
    PostingIndex.build(docs, "doc_id", "text", path, termBuckets = 8)
    val a = PostingIndex.scoreQuery(spark, path, Seq("join"), termBuckets = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val b = Relevance.bm25(docs, "doc_id", "text", Seq("join"))
      .filter(col("tf_0") > 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(a === b)
  }

  test("the postings scan is partition-pruned to the query's buckets") {
    val path = freshPath()
    PostingIndex.build(docs, "doc_id", "text", path, termBuckets = 8)
    val terms = Seq("spark")
    val q = PostingIndex.scoreQuery(spark, path, terms, termBuckets = 8)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val wanted = PostingIndex.bucketsOf(Seq("spark"), 8)
    assert(wanted.size === 1)
    // the postings FileScan must carry the bucket partition filter
    assert(plan.contains("PartitionFilters") &&
      plan.contains(s"bucket"), plan.take(800))
    val scan = plan.split("\n").find(l =>
      l.contains("postings") && l.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("bucket#") || scan.contains("bucket IN") ||
      scan.contains("bucket"), s"no bucket partition filter:\n$scan")
  }

  test("append-then-serve equals build-on-everything exactly") {
    val (a, b) = (docs.filter($"doc_id" <= 3), docs.filter($"doc_id" > 3))
    val incr = freshPath(); val full = freshPath()
    PostingIndex.build(a, "doc_id", "text", incr, termBuckets = 8)
    PostingIndex.append(b, "doc_id", "text", incr, wave = 1L,
      termBuckets = 8)
    PostingIndex.build(docs, "doc_id", "text", full, termBuckets = 8)
    val terms = Seq("spark", "table", "join")
    def serve(p: String) =
      PostingIndex.scoreQuery(spark, p, terms, termBuckets = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          (2 to 4).map(r.getLong), r.getDouble(5))).sortBy(_._1).toSeq
    assert(serve(incr) === serve(full))
  }

  test("append waves carry df/stats deltas; wave-summed reads see all") {
    val incr = freshPath()
    PostingIndex.build(docs.filter($"doc_id" <= 2), "doc_id", "text",
      incr, termBuckets = 8)
    PostingIndex.append(docs.filter($"doc_id" > 2), "doc_id", "text",
      incr, wave = 1L, termBuckets = 8)
    val n = spark.read.parquet(s"$incr/stats")
      .agg(sum($"n_docs")).collect().head.getDouble(0)
    assert(n === 5.0) // 2 + 3 across waves
    val dfJoin = spark.read.parquet(s"$incr/terms")
      .filter($"term" === "join")
      .agg(sum($"df")).collect().head.getDouble(0)
    assert(dfJoin === 3.0) // docs 1, 3, 5
  }

  test("re-running a crashed append (same wave) replaces, never doubles") {
    val incr = freshPath()
    PostingIndex.build(docs.filter($"doc_id" <= 3), "doc_id", "text",
      incr, termBuckets = 8)
    val b = docs.filter($"doc_id" > 3)
    PostingIndex.append(b, "doc_id", "text", incr, wave = 7L,
      termBuckets = 8)
    val before = PostingIndex.scoreQuery(spark, incr,
        Seq("spark", "table", "join"), termBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(5))).sortBy(_._1).toSeq
    PostingIndex.append(b, "doc_id", "text", incr, wave = 7L,
      termBuckets = 8) // the recovery retry
    val after = PostingIndex.scoreQuery(spark, incr,
        Seq("spark", "table", "join"), termBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(5))).sortBy(_._1).toSeq
    assert(after === before)
  }

  test("build over an existing index is a full replace, not a merge") {
    val p = freshPath()
    PostingIndex.build(docs, "doc_id", "text", p, termBuckets = 8)
    PostingIndex.build(docs.filter($"doc_id" <= 2), "doc_id", "text", p,
      termBuckets = 8)
    val n = spark.read.parquet(s"$p/stats")
      .agg(sum($"n_docs")).collect().head.getDouble(0)
    assert(n === 2.0, "stale waves survived a rebuild")
  }

  test("terms absent from the corpus score like the scan scorer") {
    val path = freshPath()
    PostingIndex.build(docs, "doc_id", "text", path, termBuckets = 8)
    val terms = Seq("spark", "zzzmissing")
    val served = PostingIndex.scoreQuery(spark, path, terms, termBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(4))).sortBy(_._1).toSeq
    val scanned = Relevance.bm25(docs, "doc_id", "text", terms)
      .filter(col("tf_0") > 0 || col("tf_1") > 0)
      .collect().map(r => (r.getLong(0), r.getDouble(4))).sortBy(_._1).toSeq
    assert(served === scanned)
  }
}
