package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-shaping passes a feature pipeline runs before training:
  * robust clipping (winsorization), equi-depth quantile binning, and
  * equal-width histograms — per group, so each segment is shaped against
  * its own distribution.
  *
  * Determinism contract (all three ops hash-match a SQL oracle):
  *   - winsorize: the clip bounds are exact linear-interpolated
  *     percentiles (≡ `percentile` ≡ DuckDB `quantile_cont`, the same
  *     cross-engine identity q_metric_profile relies on) ROUNDED to 4 dp
  *     before clipping — the comparison `x < lo` then runs against a
  *     short-decimal double that both engines hold bit-identically.
  *   - equiDepth: bucket assignment is order-deterministic only under a
  *     total order, so callers must supply a tie-breaking column; ANSI
  *     ntile semantics (first `n mod bins` buckets one element larger)
  *     are reproduced in exact integer arithmetic from the rank.
  *   - histogram: bin indexing is `floor((x − lo) / w)` on doubles —
  *     correctly-rounded IEEE ops, engine-independent; callers pick
  *     `lo`/`hi`/`bins` so `w` is exactly representable (e.g. 500/20).
  *
  * Shape for 100 TB (review r15 #2 — the window forms put each whole
  * group in one task):
  *   - winsorize rank-selects its two bounds through
  *     [[RankSelect.percentiles]] — distributed order statistics, no
  *     per-group in-memory sort — and broadcast-joins them back.
  *   - equiDepth takes ranks from the range-sharded two-level
  *     decomposition ([[RankSelect.withRankAndCount]]) and derives the
  *     ANSI ntile bucket in closed form — no task sorts more than
  *     ~1/shards of a group.
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
    val bounds = RankSelect.percentiles(df, keys, valCol,
        Seq(pLo, pHi), Seq("__blo", "__bhi"))
      .select(keys.map(col) :+ round(col("__blo"), 4).as("p_lo") :+
        round(col("__bhi"), 4).as("p_hi"): _*)
    RankSelect.joinBack(df, bounds, keys)
      .withColumn("v_clip",
        least(greatest(col(valCol), col("p_lo")), col("p_hi")))
  }

  /** Adds `bin` (1-based equi-depth bucket, ANSI ntile semantics) to
    * `df`. `tieCol` must make (valCol, tieCol) a total order within
    * every group — without it the bucket boundary under ties is
    * nondeterministic. */
  def equiDepth(df: DataFrame, keys: Seq[String], valCol: String,
      tieCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    val ranked = RankSelect.withRankAndCount(df, keys,
      Seq(valCol, tieCol), "__rk", "__gn")
    // ANSI ntile from the exact rank: q = n div b, r = n mod b; the
    // first r buckets hold q+1 rows. All exact BIGINT `div` arithmetic;
    // the case-when guards the q=0 branch (n < bins, every row its own
    // bucket) so the division never sees a zero.
    ranked
      .withColumn("__q", expr(s"__gn div ${nBins}L"))
      .withColumn("__r", expr(s"__gn % ${nBins}L"))
      .withColumn("__cut", expr("__r * (__q + 1L)"))
      .withColumn("bin", expr(
        "cast((case when __rk <= __cut then (__rk - 1L) div (__q + 1L) " +
          "else __r + (__rk - __cut - 1L) div __q end) + 1L as int)"))
      .drop("__rk", "__gn", "__q", "__r", "__cut")
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
