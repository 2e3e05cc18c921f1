package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact pairwise co-moment matrix — the sufficient statistics
  * (n, Σx, Σy, Σxy) for every feature pair per group, kept in BIGINT on
  * a per-feature quantization grid. Covariance, Pearson correlation,
  * and OLS slopes are one in-row IEEE expression away from these sums;
  * computing THE SUMS exactly is what makes the profile reproducible
  * (float accumulation order would differ run to run at 100 TB, these
  * never do). The feature-association face of the profiling family
  * (q_zscore scales single columns; this relates columns to each
  * other).
  *
  * Shape for 100 TB: quantization and the M(M+1)/2 per-row products are
  * in-row codegen; the explode multiplies rows by the PAIR count (M=4 →
  * 10), and the single hash aggregate is fully partial-aggregatable —
  * map-side combine collapses each partition to groups×pairs rows
  * before the only shuffle. No window, no join.
  *
  * Overflow discipline: |Σxy| ≤ n·max|x|·max|y| on the quantized grid —
  * callers pick per-feature scales so the per-group bound stays inside
  * BIGINT (the q_comoments face keeps money columns at scale 1, ratio
  * columns at 100: bound ~2e15 per sf0.1 group, three decades of
  * headroom).
  */
object Comoments {

  /** @param feats (column, scale) pairs; each value enters as
    *              floor(v·scale + 0.5) — half-up, IEEE-identical
    *              across engines
    * @return one row per (keys..., fi, fj) with fi ≤ fj (names, so the
    *         diagonal carries the variance sums): n, s_i, s_j, s_ij */
  def comoments(df: DataFrame, keys: Seq[String],
                feats: Seq[(String, Long)]): DataFrame = {
    require(feats.nonEmpty, "need at least one feature")
    def q(cs: (String, Long)): Column =
      floor(col(cs._1) * lit(cs._2) + lit(0.5)).cast("long")

    val pairCells = for {
      i <- feats.indices
      j <- i until feats.size
    } yield struct(
      lit(feats(i)._1).as("fi"), lit(feats(j)._1).as("fj"),
      q(feats(i)).as("xi"), q(feats(j)).as("xj"),
      (q(feats(i)) * q(feats(j))).as("xij"))

    df.select(keys.map(col) :+
        explode(array(pairCells: _*)).as("cell"): _*)
      .select(keys.map(col) :+ col("cell.fi") :+ col("cell.fj") :+
        col("cell.xi") :+ col("cell.xj") :+ col("cell.xij"): _*)
      // pairwise deletion: a null in EITHER feature nulls the product —
      // dropping the cell keeps (n, s_i, s_j, s_ij) mutually consistent
      // over exactly the complete rows for that pair
      .filter(col("xij").isNotNull)
      .groupBy((keys :+ "fi" :+ "fj").map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("s_i"),
        sum(col("xj")).as("s_j"), sum(col("xij")).as("s_ij"))
  }
}
