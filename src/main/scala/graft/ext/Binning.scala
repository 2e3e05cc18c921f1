package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-shaping passes a feature pipeline runs before training:
  * robust clipping (winsorization), equi-depth quantile binning, and
  * equal-width histograms — per group, so each segment is shaped against
  * its own distribution.
  *
  * Determinism contract (all three ops hash-match a SQL oracle):
  *   - winsorize: the clip bounds are exact linear-interpolated
  *     percentiles (`percentile` ≡ DuckDB `quantile_cont`, the same
  *     cross-engine identity q_metric_profile relies on) ROUNDED to 4 dp
  *     before clipping — the comparison `x < lo` then runs against a
  *     short-decimal double that both engines hold bit-identically.
  *   - equiDepth: `ntile` is order-deterministic only under a total
  *     order, so callers must supply a tie-breaking column; ANSI ntile
  *     semantics (first buckets one element larger) match across engines.
  *   - histogram: bin indexing is `floor((x − lo) / w)` on doubles —
  *     correctly-rounded IEEE ops, engine-independent; callers pick
  *     `lo`/`hi`/`bins` so `w` is exactly representable (e.g. 500/20).
  *
  * Shape for 100 TB:
  *   - winsorize runs ONE unordered window per group key — a single
  *     shuffle-and-scan computing both bounds, no join back (same shape
  *     as [[Normalize.grouped]]). Exact percentiles hold the group's
  *     values in memory per partition — fine for bounded groups (the
  *     per-segment contract here); unbounded groups should switch to
  *     `approx_percentile` and drop the oracle to rows-only.
  *   - equiDepth is one ordered window (sort within group) — the
  *     sort-based shuffle Spark already does for any ranking.
  *   - histogram is pure map-side arithmetic + one partial-aggregated
  *     count: the cheapest possible distribution sketch at any scale.
  */
object Binning {

  /** Adds `p_lo`, `p_hi` (4-dp group percentile bounds) and `v_clip`
    * (the value clipped into [p_lo, p_hi]) to `df`. */
  def winsorize(df: DataFrame, keys: Seq[String], valCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(keys.nonEmpty, "winsorize needs at least one group key")
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0, "need 0 <= pLo < pHi <= 1")
    val w = Window.partitionBy(keys.map(col): _*)
    val lo = round(expr(s"percentile($valCol, $pLo)").over(w), 4)
    val hi = round(expr(s"percentile($valCol, $pHi)").over(w), 4)
    df.withColumn("p_lo", lo)
      .withColumn("p_hi", hi)
      .withColumn("v_clip",
        least(greatest(col(valCol), col("p_lo")), col("p_hi")))
  }

  /** Adds `bin` (1-based equi-depth bucket via ntile) to `df`. `tieCol`
    * must make (valCol, tieCol) a total order within every group —
    * without it ntile is nondeterministic under ties. */
  def equiDepth(df: DataFrame, keys: Seq[String], valCol: String,
      tieCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(valCol), col(tieCol))
    df.withColumn("bin", ntile(nBins).over(w))
  }

  /** Equal-width histogram: one row per (group, non-empty bin) with the
    * bin's range and count. Out-of-range values clamp into the edge bins
    * (bin 0 / bin `bins − 1`) rather than dropping silently. */
  def histogram(df: DataFrame, keys: Seq[String], valCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    val w = (hi - lo) / bins
    val x = col(valCol)
    val bin = least(lit(bins - 1),
      greatest(lit(0), floor((x - lit(lo)) / lit(w)).cast("int")))
    df.select(keys.map(col) :+ bin.as("bin"): _*)
      .groupBy(keys.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin") * lit(w))
      .withColumn("bin_hi", lit(lo) + (col("bin") + 1) * lit(w))
  }
}
