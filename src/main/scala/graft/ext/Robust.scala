package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier statistics: median + MAD (median absolute
  * deviation) with a k·MAD flag count — the outlier screen that
  * survives the contamination it is screening for, where mean/σ
  * ([[Normalize.grouped]]'s z-score) is dragged by the very outliers
  * it should flag. The metric-quality gate for curation pipelines:
  * "how many of this source's quality scores sit beyond 3 robust
  * sigmas" is a MAD question, not a z-score question.
  *
  * Exactness discipline: EXACT interpolating `percentile` (≡ DuckDB
  * `quantile_cont`, the [[Binning]]/`q_metric_profile` parity pair),
  * results rounded to 4 dp for the oracle boundary; the outlier
  * comparison runs on the UNROUNDED medians so the flag count is the
  * operator's own arithmetic, replayed identically in SQL.
  *
  * ONE exchange total: both percentile passes are unordered windows
  * over the same group key, and the final per-group aggregate reuses
  * that partitioning (`EnsureRequirements` sees it satisfied — the
  * same single-shuffle shape as [[Binning.winsorize]]). Exact
  * percentiles hold the group's values in the window buffer — the
  * documented trade for hash-exact oracles; at extreme group sizes
  * swap `approx_percentile` and drop to a rows-only gate.
  *
  * Emits one row per group: (keys…, med DOUBLE 4dp, mad DOUBLE 4dp,
  * n_outliers BIGINT, n BIGINT).
  */
object Robust {

  def madProfile(df: DataFrame, keys: Seq[String], valCol: String,
      k: Double): DataFrame = {
    require(keys.nonEmpty, "at least one group key")
    val w = Window.partitionBy(keys.map(col): _*)
    val withMed = df
      .withColumn("med_x", expr(s"percentile($valCol, 0.5)").over(w))
      .withColumn("adev", abs(col(valCol) - col("med_x")))
    val withMad = withMed
      .withColumn("mad_x", expr("percentile(adev, 0.5)").over(w))
    withMad.groupBy(keys.map(col): _*)
      .agg(
        round(max(col("med_x")), 4).as("med"),
        round(max(col("mad_x")), 4).as("mad"),
        sum(when(col("adev") > lit(k) * col("mad_x"), 1L).otherwise(0L))
          .as("n_outliers"),
        count(lit(1)).as("n"))
  }
}
