package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order state-transition counts (the empirical Markov matrix)
  * over per-entity event sequences — behavior modeling, anomaly
  * baselines ("purchase after error is rare"), and session-flow reports.
  *
  * Per entity the events order by (ts, tieCol) — a total order, so the
  * predecessor of every event is engine-independent; transitions then
  * aggregate over all entities. The conditional probability
  * P(to | from) = n / Σ_from n emits via exact half-up integer division
  * ([[graft.ext.TextAnalysis.halfUp4]]) — no float boundary.
  *
  * Shape for 100 TB: one ordered window on the entity key (the same
  * shuffle any sequence derivation pays), then a hash aggregate on the
  * (from, to) pair — states are low-cardinality so the aggregate output
  * is tiny; the row-count window over it is a no-op shuffle of a
  * state²-row table.
  */
object Transitions {

  /** @return (from_state, to_state, n, p_4dp), one row per observed
    *         transition. First events (no predecessor) contribute no
    *         transition. */
  def matrix(df: DataFrame, entityCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    val counts = df
      .withColumn("from_state", lag(col(stateCol), 1).over(w))
      .filter(col("from_state").isNotNull)
      .groupBy(col("from_state"), col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("n"))
    val rowTotal = Window.partitionBy(col("from_state"))
    counts.withColumn("p_4dp",
      graft.ext.TextAnalysis.halfUp4(col("n"), sum(col("n")).over(rowTotal)))
  }
}
