package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAgg

/** Sketch-guided EXACT heavy hitters — frequent items over a column
  * whose full cardinality is too large to shuffle (the 100 TB vocabulary
  * problem: an exact `groupBy(token)` exchanges every distinct token;
  * a year-scale corpus has billions of them, almost all singletons).
  *
  * Two passes, neither of which shuffles the data:
  *   1. `mg_candidates` (functions.MisraGriesAgg) — one Misra–Gries
  *      summary per partition, merged by the normal partial/final
  *      aggregation path into a single ≤capacity-entry candidate set.
  *      Exchange volume: one small buffer per partition. Guarantee:
  *      every item with true count > n/(capacity+1) IS a candidate.
  *   2. exact re-count of the candidates only — a BROADCAST semi join
  *      keeps candidate rows, then a groupBy whose key domain is the
  *      candidate set (≤capacity values), so the reduce side is tiny and
  *      map-side combine absorbs the volume.
  *
  * Because the threshold is constrained to lie above the sketch's error
  * bound (shareDen < capacity+1 ⇒ n/shareDen > n/(capacity+1)), no true
  * heavy hitter can be missed, and the re-count makes the surviving
  * counts exact — the OUTPUT is deterministic and partition-independent
  * even though the intermediate sketch is not. No tolerance needed.
  *
  * Driver state: one collected summary row (≤capacity entries) — the
  * same bounded-collect class as IvfIndex centroids.
  */
object FrequentItems {

  /** The merged global summary: (total non-null items, candidates with
    * their lower-bound counts, sorted count-desc then item). */
  def summary(df: DataFrame, itemCol: String,
      capacity: Int): (Long, Seq[(String, Long)]) = {
    MisraGriesAgg.register(df.sparkSession)
    val row = df
      .select(expr(s"mg_candidates(`$itemCol`, $capacity)").as("sk"))
      .head()
    val sk = row.getStruct(0)
    val total = sk.getLong(0)
    val items = sk.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    (total, items)
  }

  /** Items occurring in at least a 1/shareDen share of all non-null
    * rows, with EXACT counts: (itemCol, n_occ) where
    * n_occ * shareDen >= n. Requires shareDen < capacity+1 so the
    * sketch's candidate guarantee covers the threshold. */
  def exactHeavyHitters(df: DataFrame, itemCol: String, shareDen: Long,
      capacity: Int = 4096): DataFrame = {
    require(shareDen >= 1, s"shareDen must be positive, got $shareDen")
    require(shareDen < capacity + 1L,
      s"shareDen=$shareDen must be < capacity+1=${capacity + 1} or the " +
        "sketch cannot guarantee candidate coverage at the threshold")
    val (total, cands) = summary(df, itemCol, capacity)
    // local prefilter: a candidate whose lower bound plus the global
    // undercount slack still misses the threshold cannot be heavy —
    // shrinks the broadcast without risking the guarantee
    val slack = total / (capacity + 1L)
    val kept = cands.collect {
      case (item, lb) if (lb + slack) * shareDen >= total => item
    }
    val spark = df.sparkSession
    import spark.implicits._
    exactFromCandidates(df, itemCol, shareDen, total, kept.toDF(itemCol))
  }

  /** The exact second pass, factored so candidates can come from a live
    * sketch (exactHeavyHitters) OR a persisted-summary rollup
    * (rollupCandidates): broadcast-semi keep, tiny re-count, threshold. */
  def exactFromCandidates(df: DataFrame, itemCol: String, shareDen: Long,
      total: Long, candidates: DataFrame): DataFrame =
    df.join(broadcast(candidates.select(col(itemCol))), Seq(itemCol),
        "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") * shareDen >= lit(total))

  // ── persisted-slice pattern (the HLL-rollup analogue for frequent
  //    items): build one MG summary per slice (per-day, per-source),
  //    persist the tiny (keys, total, items) rows, and roll ANY later
  //    grouping up merge-only — raw data is never rescanned. Mergeable-
  //    summaries math keeps the candidate guarantee through the rollup:
  //    undercount ≤ N/(capacity+1) over the merged total.

  /** One MG summary row per `sliceKeys` group:
    * (sliceKeys..., total, items). */
  def sliceSummaries(df: DataFrame, sliceKeys: Seq[String],
      itemCol: String, capacity: Int): DataFrame = {
    require(sliceKeys.nonEmpty, "slices need at least one key")
    MisraGriesAgg.register(df.sparkSession)
    df.groupBy(sliceKeys.map(col): _*)
      .agg(expr(s"mg_candidates(`$itemCol`, $capacity)").as("sk"))
      .select(sliceKeys.map(col) ++
        Seq(col("sk.total").as("total"), col("sk.items").as("items")): _*)
  }

  /** Merge persisted summaries up to `rollupKeys` (a subset of the
    * build keys; empty = global) WITHOUT touching raw data: counters
    * add, then the (capacity+1)-th largest is subtracted per group (the
    * mergeable-summaries truncation). Returns
    * (rollupKeys..., item, lb, total). The per-group row count is
    * bounded by slices×capacity pre-truncation — summary-sized, never
    * data-sized. */
  def rollupCandidates(summaries: DataFrame, rollupKeys: Seq[String],
      capacity: Int): DataFrame = {
    // a constant key makes the global (no-keys) rollup the same code
    // path as the grouped one
    val tagged =
      if (rollupKeys.nonEmpty) summaries
      else summaries.withColumn("_g", lit(1))
    val keyNames = if (rollupKeys.nonEmpty) rollupKeys else Seq("_g")
    val keys = keyNames.map(col)
    val totals = tagged.groupBy(keys: _*)
      .agg(sum(col("total")).as("total"))
    val counts = tagged
      .select(keys :+ explode(col("items")).as("it"): _*)
      .groupBy(keys :+ col("it.item").as("item"): _*)
      .agg(sum(col("it.lb")).as("lb"))
    // the (capacity+1)-th largest counter per group, 0 if none: the
    // mergeable-summaries truncation. Group row counts are bounded by
    // slices×capacity, so the rank window is summary-sized.
    val d = counts
      .withColumn("rk", row_number().over(
        Window.partitionBy(keys: _*).orderBy(col("lb").desc, col("item"))))
      .filter(col("rk") === capacity + 1)
      .select(keys :+ col("lb").as("trunc"): _*)
    counts.join(broadcast(d), keyNames, "left")
      .withColumn("lb", col("lb") - coalesce(col("trunc"), lit(0L)))
      .filter(col("lb") > 0)
      .drop("trunc")
      .join(broadcast(totals), keyNames, "inner")
      .drop("_g")
  }
}
