package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier statistics: median + MAD (median absolute
  * deviation) with a k·MAD flag count — the outlier screen that
  * survives the contamination it is screening for, where mean/σ
  * ([[Normalize.grouped]]'s z-score) is dragged by the very outliers
  * it should flag. The metric-quality gate for curation pipelines:
  * "how many of this source's quality scores sit beyond 3 robust
  * sigmas" is a MAD question, not a z-score question.
  *
  * Exactness discipline: EXACT interpolating percentiles (≡ DuckDB
  * `quantile_cont`, the [[Binning]]/`q_metric_profile` parity pair),
  * results rounded to 4 dp for the oracle boundary; the outlier
  * comparison runs on the UNROUNDED medians so the flag count is the
  * operator's own arithmetic, replayed identically in SQL.
  *
  * Shape for 100 TB (review r15 #2): both medians come from
  * distributed rank-select ([[RankSelect.percentiles]]) — two
  * broadcast-joined order-statistic passes, no per-group in-memory
  * percentile buffer, no task ever holding a whole group. The second
  * pass necessarily re-reads the input (MAD's deviations depend on
  * the first pass's median — that data dependency exists in any
  * engine); both passes are fully parallel.
  *
  * Emits one row per group: (keys…, med DOUBLE 4dp, mad DOUBLE 4dp,
  * n_outliers BIGINT, n BIGINT).
  */
object Robust {

  def madProfile(df: DataFrame, keys: Seq[String], valCol: String,
      k: Double): DataFrame = {
    require(keys.nonEmpty, "at least one group key")
    val med = RankSelect.percentiles(df, keys, valCol,
      Seq(0.5), Seq("med_x"))
    val withMed = RankSelect.joinBack(df, med, keys)
      .withColumn("adev", abs(col(valCol) - col("med_x")))
    val mad = RankSelect.percentiles(withMed, keys, "adev",
      Seq(0.5), Seq("mad_x"))
    val withMad = RankSelect.joinBack(withMed, mad, keys)
    withMad.groupBy(keys.map(col): _*)
      .agg(
        round(max(col("med_x")), 4).as("med"),
        round(max(col("mad_x")), 4).as("mad"),
        sum(when(col("adev") > lit(k) * col("mad_x"), 1L).otherwise(0L))
          .as("n_outliers"),
        count(lit(1)).as("n"))
  }
}
