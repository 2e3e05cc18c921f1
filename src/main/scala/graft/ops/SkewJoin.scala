package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi join (the join-side salting pattern, completing
  * [[SkewAgg]]'s aggregation story).
  *
  * A shuffle join on a hot key puts every row of that key on one
  * partition of BOTH sides; at 100 TB a key holding 1% of the fact table
  * stalls the stage. Salting splits each fact key into `saltBuckets`
  * sub-keys (deterministic hash of a high-cardinality distributor
  * column, NOT `rand()` — task retries stay deterministic) and
  * replicates the build side once per bucket, so the hot key spreads
  * over `saltBuckets` partitions. Join semantics are exactly the plain
  * inner equi join (proven by oracle); cost is `saltBuckets ×` the build
  * side — which is why this targets MEDIUM build sides: small enough to
  * replicate, too big (or too hot) to broadcast.
  *
  * When to reach for it: AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin`) already handles most cases by
  * splitting oversized partitions at runtime — but it only fires on
  * sort-merge joins and only when partition stats reveal the skew.
  * Salting is the static fallback for hash joins, pre-AQE engines, and
  * the case where one KEY (not one partition) is the problem.
  */
object SkewJoin {

  /** Inner equi join of `fact` to `build` on `keys`, fact keys salted
    * into `saltBuckets` sub-keys, build side replicated per bucket. */
  def saltedJoin(
      fact: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      distributor: Column,
      saltBuckets: Int
  ): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    require(keys.nonEmpty, "need at least one join key")
    val salted = fact.withColumn("__salt",
      pmod(hash(distributor), lit(saltBuckets)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
