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

  /** Uniform [0, 65536) bucket from the id's md5 (first 4 hex chars via
    * base conversion) — SQL-reproducible: engines without `conv` rebuild
    * it with per-nibble strpos arithmetic, same value. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long")

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
}
