package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-phase aggregation (the "salting" pattern).
  *
  * A plain `groupBy(key).agg(...)` puts every row of a hot key on one
  * shuffle partition; at 100 TB a single key holding 1% of the data stalls
  * the whole stage. Salting splits each key into `saltBuckets` sub-groups
  * for the first (parallel) aggregation, then combines the partials in a
  * second, tiny aggregation. Works for any algebraic aggregate; exposed
  * here for count / sum / min / max — the shapes the reference uses.
  *
  * AQE's skew-join splitting handles *join* skew automatically; aggregation
  * skew still needs this manual split (AQE cannot split a running
  * HashAggregate group).
  *
  * The salt is derived from a deterministic hash of the whole row's
  * distributor column, NOT `rand()` — results (and retries at the task
  * level) stay deterministic.
  */
object SkewAgg {
  /** @param distributor any column with high cardinality within a key
    *                    group (a row id, timestamp, …) used to spread rows
    *                    across salt buckets deterministically. */
  def saltedSum(
      df: DataFrame,
      keys: Seq[String],
      distributor: Column,
      saltBuckets: Int,
      sums: Map[String, Column],
      counts: Seq[String] = Nil
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(distributor), lit(saltBuckets)))
    val phase1Aggs =
      sums.toSeq.sortBy(_._1).map { case (n, c) => sum(c).as(n) } ++
        counts.map(n => count(lit(1)).as(n))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)
    val phase2Aggs =
      (sums.keys.toSeq.sorted ++ counts).map(n => sum(col(n)).as(n))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }
}
