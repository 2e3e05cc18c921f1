package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level EXACT exclusive prefix sums over the repo's deterministic
  * hash-rank order — the scale-out replacement for the one shape that
  * does not survive a 100× thought experiment: a running-sum window
  * `partitionBy(group).orderBy(...).rowsBetween(unboundedPreceding, -1)`
  * serializes each group through a single task's sort chain, so the
  * dominant language of a 100 TB corpus becomes one straggler task.
  *
  * Decomposition (classic scan-then-propagate, e.g. Blelloch's
  * work-efficient scan; here over Spark relational ops):
  *
  *   1. `shard` = the top `log2(shards)` bits of the 32-bit id hash —
  *      a MONOTONE function of the leading sort key, so shard ranges
  *      tile the total order: every row of shard s precedes every row
  *      of shard s+1 within its group;
  *   2. one hash-aggregate computes per-(group, shard) subtotals
  *      (groups × shards rows — partial aggregation collapses the big
  *      side map-side);
  *   3. an ordered window over THAT TINY TABLE turns subtotals into
  *      exclusive shard offsets (per-group serialization over ≤ shards
  *      rows — irrelevant);
  *   4. a broadcast join puts each row's shard offset back, and a
  *      window partitioned by (group, SHARD) adds the within-shard
  *      exclusive sum — parallelism = groups × shards, no task ever
  *      sorts more than 1/shards of a group.
  *
  * The result is BIT-IDENTICAL to the single-window form: an exclusive
  * prefix over a total order equals (sum of all complete earlier
  * shards) + (exclusive prefix within the row's own shard), and BIGINT
  * addition is associative — no floating point anywhere.
  *
  * Cost: the input is scanned twice (subtotal pass + window pass) with
  * map-side-cheap hash arithmetic, versus one scan that serializes
  * per-group. At scale the second scan is noise; callers that already
  * checkpoint their input (CurationE2e) pay a cached re-read.
  */
object PrefixSums {

  /** Exclusive running sum of `valueCol` under the total order
    * (hash32(idCol), idCol, tieCols…) within each `partCols` group,
    * added as `outCol` (BIGINT; 0 for each group's first row). The
    * order is [[Splits.hashBucket]]'s 8-nibble md5 rank with the id
    * (and any tie columns, e.g. `copy_idx`) as tie-breaks — exactly
    * [[Sampling.tokenBudget]]'s order, reproducible in plain SQL.
    *
    * `shards` must be a power of two in [1, 65536]; it bounds the
    * longest per-task sort at ~group/shards rows. 64 (the default)
    * already caps a single-language corpus at 1/64 per task; pick
    * ≈ cluster cores for production runs.
    */
  def hashOrderedExclusiveSum(df: DataFrame, partCols: Seq[String],
      idCol: String, valueCol: String, tieCols: Seq[String],
      outCol: String, shards: Int = 64): DataFrame = {
    require(shards >= 1 && shards <= 65536 &&
      Integer.bitCount(shards) == 1,
      s"shards must be a power of two in [1, 65536]: $shards")
    require(partCols.nonEmpty, "need at least one partition column")
    val k = Integer.numberOfTrailingZeros(shards)
    // the hash IS the leading sort key; its top k bits are the shard,
    // so shard boundaries never split the order (shiftright on the
    // long is exact — no double division anywhere)
    val h32 = Splits.hashBucket(col(idCol), nibbles = 8)
    val withShard = df
      .withColumn("__h32", h32)
      .withColumn("__shard", shiftright(col("__h32"), 32 - k))
    val partC = partCols.map(col)
    val subtotals = withShard
      .groupBy(partC :+ col("__shard"): _*)
      .agg(sum(col(valueCol)).as("__sub"))
    val wOff = Window.partitionBy(partC: _*).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subtotals
      .withColumn("__off", coalesce(sum(col("__sub")).over(wOff), lit(0L)))
      .drop("__sub")
    val wIn = Window.partitionBy(partC :+ col("__shard"): _*)
      .orderBy(col("__h32") +: (idCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    withShard
      .join(broadcast(offsets), partCols :+ "__shard")
      .withColumn(outCol,
        col("__off") + coalesce(sum(col(valueCol)).over(wIn), lit(0L)))
      .select(df.columns.map(col) :+ col(outCol): _*) // original order
  }
}
