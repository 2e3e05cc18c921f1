package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group feature scaling — z-score and min-max — the normalization
  * pass a feature-engineering pipeline runs before training, grouped so
  * each segment (per event type, per tenant, per source) is standardized
  * against its own distribution.
  *
  * Determinism contract: the input column must be INTEGER-VALUED. Group
  * sums (Σx, Σx², n, min, max) are then exact BIGINTs regardless of
  * aggregation order — a float sum would be order-dependent and can
  * never hash-match an oracle. The scaled values are derived from those
  * exact integers through an IEEE multiply/divide/sqrt chain (each op
  * correctly rounded, engine-independent) mirrored verbatim in the SQL
  * oracle, then rounded to 4 dp:
  *   z  = (x − Sx/n) / sqrt( (Sxx − Sx·Sx/n) / (n−1) )
  *   mm = (x − min) / (max − min)
  * z is NULL for groups with n < 2 or zero variance; mm is NULL for
  * constant groups (max = min) — explicit, instead of ±Inf/NaN.
  * mm is a ratio of SMALL INTEGERS, which can land exactly on .xxxx5
  * (e.g. 1/32) where `round(double, 4)` is engine-dependent — so it uses
  * the exact integer half-up formulation ([[TextAnalysis.halfUp4]])
  * instead of round(). z's sqrt chain cannot terminate at the 5th
  * decimal, so round-4 is safe there (same argument as BM25's ln).
  *
  * Shape for 100 TB: ONE unordered window over the group key computes
  * all five aggregates in a single shuffle-and-scan (no join back, no
  * second pass); everything after is per-row codegen arithmetic. Exact
  * BIGINT sums require Σx² < 2⁶³ per group — |x| ≤ 10⁶ holds to ~10¹⁰
  * rows per group; larger domains should pre-bucket or shard the key.
  */
object Normalize {

  /** Adds `z` and `mm` (4-dp doubles) to `df`. `valCol` must be
    * integer-valued (see determinism contract above). */
  def grouped(df: DataFrame, keys: Seq[String], valCol: String): DataFrame = {
    require(keys.nonEmpty, "grouped scaling needs at least one key")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    val x = col(valCol).cast("long")
    val sx = sum(x).over(w)
    val sxx = sum(x * x).over(w)
    // count(x), not count(*): null-valued rows must not inflate the
    // denominator the mean/variance divide by (they contribute nothing
    // to the sums, and their own z/mm are null via null propagation)
    val n = count(x).over(w)
    val mn = min(x).over(w)
    val mx = max(x).over(w)

    val xd = x.cast("double")
    val nd = n.cast("double")
    val sxd = sx.cast("double")
    val varNum = sxx.cast("double") - sxd * sxd / nd
    val z = (xd - sxd / nd) /
      sqrt(varNum / (n - lit(1L)).cast("double"))
    val mm = TextAnalysis.halfUp4(x - mn, mx - mn)
    // + 0.0 normalizes IEEE negative zero (a tiny-negative z rounds to
    // -0.0 in binary-rounding engines, +0.0 via BigDecimal — =-equal,
    // hash-different)
    df.withColumn("z",
        when(n >= 2 && varNum > 0, round(z, 4) + lit(0.0)).otherwise(lit(null)))
      .withColumn("mm",
        when(mx > mn, mm).otherwise(lit(null)))
  }

  /** Rank (quantile) normalization: adds `pr` = ANSI percent_rank under
    * the (valCol, tieCol) total order per group — the distribution-free
    * scaling that is immune to outliers entirely (rank depends only on
    * order). The tie column makes ranks — and therefore the output —
    * deterministic under equal values; percent_rank's (rank−1)/(n−1) is
    * a division of exact integers, bit-identical in any engine. Null
    * ordering is pinned NULLS FIRST explicitly — engine DEFAULTS differ
    * (Spark ASC is nulls-first, DuckDB ASC is nulls-last), so an oracle
    * must spell out `NULLS FIRST` too. Singleton groups emit 0.0 (the
    * ANSI convention). Same one-shuffle ordered-window shape as
    * [[TimeFeatures.derive]]. */
  def rankNormalize(df: DataFrame, keys: Seq[String], valCol: String,
      tieCol: String): DataFrame = {
    require(keys.nonEmpty, "rank normalization needs at least one key")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(valCol).asc_nulls_first, col(tieCol).asc_nulls_first)
    df.withColumn("pr", percent_rank().over(w))
  }
}
