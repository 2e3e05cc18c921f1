package graft.ext

import org.apache.spark.sql.DataFrame
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
  * Shape for 100 TB (review r15 #2): a `groupBy().agg()` computes the
  * five exact-integer group aggregates with MAP-SIDE partial
  * aggregation, and a broadcast join puts them back — two fully
  * parallel exchanges, and no task ever holds more than its partition.
  * The previous form (one unordered window over the group key) was a
  * single shuffle but WindowExec colocates each group in ONE task — a
  * corpus-spanning key like `l_returnflag` (3 values) serialized a
  * third of the fact table per task at 100×. Results are bit-identical:
  * the group stats are exact BIGINTs either way, and the per-row IEEE
  * chain is unchanged. The stats side is one row per segment
  * (broadcastable by the bounded-segment contract; thousands of
  * groups = kilobytes). Exact BIGINT sums require Σx² < 2⁶³ per group —
  * |x| ≤ 10⁶ holds to ~10¹⁰ rows per group; larger domains should
  * pre-bucket or shard the key.
  */
object Normalize {

  /** Adds `z` and `mm` (4-dp doubles) to `df`. `valCol` must be
    * integer-valued (see determinism contract above). */
  def grouped(df: DataFrame, keys: Seq[String], valCol: String): DataFrame = {
    require(keys.nonEmpty, "grouped scaling needs at least one key")
    val x = col(valCol).cast("long")
    // count(x), not count(*): null-valued rows must not inflate the
    // denominator the mean/variance divide by (they contribute nothing
    // to the sums, and their own z/mm are null via null propagation)
    val stats = df.groupBy(keys.map(col): _*).agg(
      sum(x).as("__sx"), sum(x * x).as("__sxx"), count(x).as("__n"),
      min(x).as("__mn"), max(x).as("__mx"))
    val joined = RankSelect.joinBack(df, stats, keys)

    val xd = x.cast("double")
    val n = col("__n")
    val nd = n.cast("double")
    val sxd = col("__sx").cast("double")
    val varNum = col("__sxx").cast("double") - sxd * sxd / nd
    val z = (xd - sxd / nd) /
      sqrt(varNum / (n - lit(1L)).cast("double"))
    val mm = TextAnalysis.halfUp4(x - col("__mn"), col("__mx") - col("__mn"))
    // + 0.0 normalizes IEEE negative zero (a tiny-negative z rounds to
    // -0.0 in binary-rounding engines, +0.0 via BigDecimal — =-equal,
    // hash-different)
    joined
      .withColumn("z",
        when(n >= 2 && varNum > 0, round(z, 4) + lit(0.0)).otherwise(lit(null)))
      .withColumn("mm",
        when(col("__mx") > col("__mn"), mm).otherwise(lit(null)))
      .drop("__sx", "__sxx", "__n", "__mn", "__mx")
  }

  /** Rank (quantile) normalization: adds `pr` = ANSI percent_rank under
    * the (valCol, tieCol) total order per group — the distribution-free
    * scaling that is immune to outliers entirely (rank depends only on
    * order). The tie column must make (valCol, tieCol) a TOTAL order
    * within every group (rows are ranked row_number-style, the
    * percent_rank identity under a total order); percent_rank's
    * (rank−1)/(n−1) is a division of exact integers, bit-identical in
    * any engine. Null ordering is pinned NULLS FIRST explicitly —
    * engine DEFAULTS differ (Spark ASC is nulls-first, DuckDB ASC is
    * nulls-last), so an oracle must spell out `NULLS FIRST` too.
    * Singleton groups emit 0.0 (the ANSI convention).
    *
    * Shape for 100 TB (review r15 #2): ranks come from the range-
    * sharded two-level decomposition ([[RankSelect.withRankAndCount]])
    * — no task sorts more than ~1/shards of a group — instead of one
    * ordered window that serialized each group through a single task's
    * sort chain. */
  def rankNormalize(df: DataFrame, keys: Seq[String], valCol: String,
      tieCol: String): DataFrame = {
    require(keys.nonEmpty, "rank normalization needs at least one key")
    RankSelect.withRankAndCount(df, keys, Seq(valCol, tieCol),
      "__rk", "__gn")
      .withColumn("pr",
        when(col("__gn") > 1L,
          (col("__rk") - lit(1L)).cast("double") /
            (col("__gn") - lit(1L)).cast("double"))
          .otherwise(lit(0.0)))
      .drop("__rk", "__gn")
  }
}
