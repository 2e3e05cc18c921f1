package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands: merge overlapping (or touching) `[start, end]`
  * intervals per key into maximal islands — downtime windows, session
  * coverage, maintenance overlap, the validity-interval compaction for
  * SCD2 outputs. Classic windowed formulation:
  *
  *   1. order intervals per key (total order: start, end, tie-break);
  *   2. an island STARTS where `start` exceeds the running max of all
  *      earlier `end`s (strictly after: touching intervals merge);
  *   3. island id = running sum of start flags; aggregate per island.
  *
  * ONE shuffle on the key; both windows and the final aggregation share
  * the same partitioning. Callers pass `tieBreak` when (start, end) can
  * collide — the island assignment is tie-order-insensitive, but a total
  * order keeps the plan deterministic for oracle comparison.
  */
object Intervals {

  /** The shared total order and running max-of-earlier-ends — ONE
    * definition so the merge and its gap complement can never
    * de-synchronize on tie-break or frame semantics. */
  private def prevEndMax(keys: Seq[String], startCol: String,
      endCol: String, tieBreak: Seq[String]) = {
    val ord = (Seq(startCol, endCol) ++ tieBreak).map(c => col(c).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    (w, max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
  }

  def mergeOverlapping(
      df: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      tieBreak: Seq[String] = Nil
  ): DataFrame = {
    val (w, prevMax) = prevEndMax(keys, startCol, endCol, tieBreak)
    df.withColumn("__brk",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("n_merged"))
      .select(keys.map(col) ++
        Seq(col(startCol), col(endCol), col("n_merged")): _*)
  }

  /** The complement of [[mergeOverlapping]]: the UNCOVERED spans between
    * islands per key — downtime windows, monitoring blind spots, SLA
    * gaps. A gap opens at the running max of all earlier `end`s and
    * closes at the first `start` strictly beyond it, so gaps fall out of
    * the SAME single window pass (one shuffle, no island aggregation
    * needed): every island-break row (except a key's first) IS a gap.
    * Emits (keys, gap_start, gap_end, gap_len). */
  def gaps(
      df: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      tieBreak: Seq[String] = Nil
  ): DataFrame = {
    val (_, prevMax) = prevEndMax(keys, startCol, endCol, tieBreak)
    df.withColumn("__pm", prevMax)
      .filter(col("__pm").isNotNull && col(startCol) > col("__pm"))
      .select(keys.map(col) ++ Seq(
        col("__pm").as("gap_start"),
        col(startCol).as("gap_end"),
        (col(startCol) - col("__pm")).as("gap_len")): _*)
  }
}
