package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splits for training pipelines: every row lands in
  * exactly one named split, decided by a content hash of its id — the same
  * row goes to the same split on every run, on any cluster, in any engine
  * (no `rand()`, no partition-order dependence, no seed bookkeeping).
  *
  * Mechanism: the first 4 hex chars of `md5(id)` form a uniform bucket in
  * [0, 65536); cumulative fraction boundaries carve the bucket space.
  * Pure codegen column arithmetic — a narrow projection over any scan,
  * nothing shuffles.
  */
object Splits {

  /** Uniform [0, 16^nibbles) bucket from the id's md5 prefix via base
    * conversion — SQL-reproducible: engines without `conv` rebuild it
    * with per-nibble strpos arithmetic, same value. 4 nibbles (the split
    * default) gives 65 536 buckets; [[NegativeSampling]] widens to 8 for
    * a 32-bit domain. Capped at 15 so the value fits a signed long. */
  def hashBucket(id: Column, nibbles: Int = 4): Column = {
    require(nibbles >= 1 && nibbles <= 15, "nibbles must be in [1, 15]")
    conv(substring(md5(id.cast("string")), 1, nibbles), 16, 10).cast("long")
  }

  /** Split-leakage audit: the train/val contamination check a pipeline
    * runs after splitting — find normalized-content fingerprints
    * ([[TextAnalysis.fingerprint]]) that appear in MORE THAN ONE split
    * (a re-crawled or near-exact duplicate whose copies hash to
    * different splits leaks evaluation data into training).
    *
    * Emits (fp, n_docs, n_splits, splits, first_id), leaked groups only.
    * Shape: split assignment and fingerprint are per-row codegen; the
    * audit is ONE fingerprint-keyed aggregate — no pairing, no join,
    * O(corpus) at any scale. (Splitting on a CONTENT hash instead of the
    * id would prevent this class of leak — this operator is the audit
    * for pipelines that split by id.)
    */
  def leakageAudit(df: DataFrame, idCol: String, textCol: String,
      weights: Seq[(String, Double)]): DataFrame =
    hashSplit(df, idCol, weights)
      .select(col(idCol), col("split"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("split")).as("n_splits"),
        array_join(array_sort(collect_set(col("split"))), ",").as("splits"),
        min(col(idCol)).as("first_id"))
      .filter(col("n_splits") >= 2)

  /** Assign each row a split label by cumulative weight. Weights need not
    * sum to 1 — they are normalized; boundaries are `floor(cum · 65536)`
    * so the assignment is exact integer arithmetic.
    */
  def hashSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val bounds = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(f => math.floor(f * 65536).toLong)
    val bucket = hashBucket(col(idCol))
    val labeled = weights.map(_._1).zip(bounds).reverse
      .foldLeft(lit(weights.last._1)) { case (acc, (name, hi)) =>
        when(bucket < hi, name).otherwise(acc)
      }
    df.withColumn("split", labeled)
  }

  /** Deterministic training-order shuffle + sharding — the pipeline's
    * last step before the trainer reads: every row gets a `shard` and a
    * `pos` within it, together a reproducible global visit order with no
    * `rand()` and no global sort. Shard = id-hash bucket (map-only, like
    * [[hashSplit]]); pos = rank within the shard under the md5-string
    * order (fixed-width lowercase hex compares identically as bytes in
    * any engine, the q_token_budget trick — adjacent input ids land far
    * apart, which is the point of shuffling).
    *
    * Scale shape: ONE window partitioned BY SHARD — parallelism = shard
    * count (pick shards ≈ trainer file count, thousands), never a single
    * global ordering. Writers then `partitionBy(shard)`, sorted by pos.
    */
  def shardOrder(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards >= 1 && shards <= 65536, "shards must be in [1, 65536]")
    import org.apache.spark.sql.expressions.Window
    val rk = md5(col(idCol).cast("string"))
    df.withColumn("shard", hashBucket(col(idCol)) % shards)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(rk, col(idCol)))
        .cast("long"))
  }
}
