package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 posting index — the SPARSE-retrieval serving path,
  * and the text twin of [[IvfIndex]]'s persisted/pruned dense path:
  * [[Relevance.bm25]] recomputes corpus statistics per query (right
  * for one-off analytics, wrong for a serving loop over a 100 TB
  * corpus); this operator pays the corpus scan ONCE at build time and
  * answers each query from partition-pruned posting reads.
  *
  * Layout under `path` (all parquet):
  *   - `postings/` — (term, doc_id, tf) partitioned by `bucket` =
  *     hash(term) mod `termBuckets`: a k-term query reads at most k
  *     buckets — the pruning unit. Within a bucket, rows for the
  *     non-queried terms are skipped by the pushed `term IN (...)`
  *     filter.
  *   - `doclens/` — (doc_id, dl): joined to postings per query (only
  *     matching docs' lengths are ever needed — the join keys on the
  *     pruned posting output, never a corpus scan).
  *   - `terms/`   — (term, df) per distinct term; `stats/` — ONE row
  *     (n_docs, sum_dl). Both tiny; broadcast at query time.
  *
  * Score parity is a CONTRACT: [[scoreQuery]] reproduces
  * [[Relevance.bm25]]'s float expression tree literally (same idf
  * form, same association order, same 4-dp rounding), so
  * index-then-serve equals scan-scoring bit-for-bit on matching docs —
  * `q_bm25_indexed` hash-gates that equivalence against the SAME SQL
  * oracle as `q_bm25`, restricted to docs with ≥ 1 hit (a doc no query
  * term touches is exactly what the index never reads).
  *
  * Determinism/races: the layout is immutable-once-built; builders
  * stage into the caller-scoped `path` (per-run unique in the query
  * faces, the post-ADVICE-r9 scratch discipline).
  */
object PostingIndex {

  /** One corpus pass: tokenize, count (term, doc) tf, derive df and
    * corpus stats, write the four tables. `overwrite` semantics. */
  def build(docs: DataFrame, idCol: String, textCol: String,
            path: String, termBuckets: Int = 64): Unit = {
    require(termBuckets >= 1, s"termBuckets must be >= 1: $termBuckets")
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.words(col(textCol)).as("ws"))
      .localCheckpoint() // feeds postings AND doclens — scan once
    toks.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
      .write.mode("overwrite").parquet(s"$path/doclens")
    val postings = toks
      .select(col("doc_id"), explode(col("ws")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("bucket",
        pmod(xxhash64(col("term"), lit(42)), lit(termBuckets)).cast("int"))
      .localCheckpoint() // feeds the posting write AND the df rollup
    postings.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    postings.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
      .write.mode("overwrite").parquet(s"$path/terms")
    toks.agg(count(lit(1)).cast("double").as("n_docs"),
        sum(size(col("ws"))).cast("double").as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Incremental index growth — fold a batch of NEW documents in
    * without re-reading the indexed corpus: postings and doclens
    * APPEND (bucket layout unchanged, so serving's pruning is
    * oblivious to which build wave wrote a file); the vocabulary-sized
    * df table and the 1-row stats merge old+delta and swap in via
    * rename-aside (every crash point leaves a complete copy — the
    * CorpusLayout discipline). Precondition, stated honestly (the
    * minhash-index posture): batch doc ids must be NEW — re-appending
    * an indexed doc would double its postings; dedup upstream.
    *
    * Serve-equivalence is the gate: append(b) after build(a) must
    * score every query exactly like build(a ∪ b) — spec- and
    * driver-row-gated. */
  def append(newDocs: DataFrame, idCol: String, textCol: String,
             path: String, termBuckets: Int = 64): Unit = {
    require(termBuckets >= 1, s"termBuckets must be >= 1: $termBuckets")
    val spark = newDocs.sparkSession
    val toks = newDocs.select(col(idCol).as("doc_id"),
      TextAnalysis.words(col(textCol)).as("ws"))
      .localCheckpoint()
    toks.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
      .write.mode("append").parquet(s"$path/doclens")
    val postings = toks
      .select(col("doc_id"), explode(col("ws")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("bucket",
        pmod(xxhash64(col("term"), lit(42)), lit(termBuckets)).cast("int"))
      .localCheckpoint()
    postings.write.mode("append").partitionBy("bucket")
      .parquet(s"$path/postings")
    // df/stats: old + delta, staged then rename-swapped (reading and
    // overwriting the same dir in one plan is not safe)
    val dfNew = spark.read.parquet(s"$path/terms")
      .unionByName(postings.groupBy(col("term"))
        .agg(count(lit(1)).cast("double").as("df")))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    swapIn(spark, dfNew, s"$path/terms")
    val statsNew = spark.read.parquet(s"$path/stats")
      .unionByName(toks.agg(count(lit(1)).cast("double").as("n_docs"),
        sum(size(col("ws"))).cast("double").as("sum_dl")))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    swapIn(spark, statsNew, s"$path/stats")
  }

  /** Stage `df` beside `live`, then rename live→old, tmp→live, drop
    * old — a crash at any point leaves a complete copy on disk. */
  private def swapIn(spark: SparkSession, df: DataFrame,
                     live: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val tmp = s"$live.tmp_swap"
    val old = s"$live.old"
    df.localCheckpoint() // sever the read-from-live lineage BEFORE swap
      .write.mode("overwrite").parquet(tmp)
    fs.delete(new Path(old), true)
    require(fs.rename(new Path(live), new Path(old)),
      s"swapIn: could not move $live aside")
    if (!fs.rename(new Path(tmp), new Path(live))) {
      fs.rename(new Path(old), new Path(live)) // roll back
      throw new IllegalStateException(s"swapIn: rename into $live failed")
    }
    fs.delete(new Path(old), true)
  }

  /** BM25 scores for `terms` over the index — docs with ≥ 1 matching
    * term, columns (doc_id, dl, tf_0.., bm25) exactly as
    * [[Relevance.bm25]] emits them (score parity contract above).
    * The postings scan carries `bucket IN (...)` (partition pruning)
    * and `term IN (...)` (row-group pushdown); stats and df broadcast. */
  def scoreQuery(spark: SparkSession, path: String, terms: Seq[String],
                 termBuckets: Int = 64, k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "scoreQuery needs at least one term")
    val lower = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    val post = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(bucketsOf(lower, termBuckets): _*) &&
        col("term").isin(lower: _*))
    // per-doc tf columns in TERM ORDER (the fold order is the parity)
    val byDoc = post.groupBy(col("doc_id"))
      .agg(max(when(col("term") === lower.head, col("tf")))
          .as("tf_raw_0"),
        lower.indices.tail.map(i =>
          max(when(col("term") === lower(i), col("tf")))
            .as(s"tf_raw_$i")): _*)
    val withTf = lower.indices.foldLeft(byDoc) { (d, i) =>
      d.withColumn(s"tf_$i", coalesce(col(s"tf_raw_$i"), lit(0L)))
    }
    // terms/stats are AGGREGATED on read: the batch layouts hold one
    // row per term / one stats row, where the aggregate is an identity;
    // [[graft.streaming.IndexStream]]'s per-batch partitions hold one
    // DELTA row per (term, batch) — batches index disjoint doc sets, so
    // df and the corpus totals are sums. One serve path for both.
    val dls = spark.read.parquet(s"$path/doclens")
      .select(col("doc_id"), col("dl"))
    val stats = spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    val dfs = spark.read.parquet(s"$path/terms")
      .filter(col("term").isin(lower: _*))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val joined = withTf.join(dls, "doc_id").crossJoin(broadcast(stats))
    val dlNorm = col("dl").cast("double") / (col("sum_dl") / col("n_docs"))
    val termScore: Int => Column = { i =>
      val tf = col(s"tf_$i").cast("double")
      val df = lit(dfs.getOrElse(lower(i), 0.0))
      val idf = log((col("n_docs") - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dlNorm))
    }
    val score = lower.indices.map(termScore).reduce(_ + _)
    joined.select(
      (col("doc_id") +: col("dl") +: lower.indices.map(i => col(s"tf_$i"))) :+
        round(score, 4).as("bm25"): _*)
  }

  /** The distinct posting buckets a term list touches — the mirror of
    * the build-side pmod(xxhash64(term, 42), termBuckets), computed
    * through Spark so the hash is the engine's own (k-bounded collect). */
  def bucketsOf(lowerTerms: Seq[String], termBuckets: Int): Seq[Int] = {
    val spark = SparkSession.active
    spark.createDataset(lowerTerms)(org.apache.spark.sql.Encoders.STRING)
      .select(pmod(xxhash64(col("value"), lit(42)), lit(termBuckets))
        .cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
  }
}
