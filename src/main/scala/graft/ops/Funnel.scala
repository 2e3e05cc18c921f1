package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — the product-analytics staple: how many
  * users performed step 1, then step 2 strictly after it, then step 3
  * strictly after that, … Each stage is the user's EARLIEST qualifying
  * event after their previous stage time (the standard greedy funnel,
  * which maximizes conversion counts: if any ordered assignment exists,
  * earliest-first finds one).
  *
  * Shape: one `groupBy(user)` per step with a join back to the previous
  * stage frame — every aggregation and join keys on the user, so after
  * the first shuffle the stages stay co-partitioned; no event-array
  * materialization, no interpreted higher-order functions, no
  * per-user explosion. k steps = k passes over the (filtered) event
  * scan; at 100 TB each pass is a pushed-down scan of one event type.
  *
  * Returns one row per step: (step_idx, step, n_users) with n_users
  * non-increasing down the funnel.
  */
object Funnel {
  def steps(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      funnel: Seq[String]
  ): DataFrame = {
    require(funnel.nonEmpty, "funnel needs at least one step")

    // stage frames: (user, t_i) = earliest step-i event after t_{i-1}.
    // Each stage is materialized once (tiny: one row per converting user)
    // — stage i feeds both stage i+1 and its own count branch, and
    // without the checkpoint the k count branches would recompute the
    // stage chain quadratically (AQE does not reuse sibling stages)
    var stages = List(
      events.filter(col(typeCol) === funnel.head)
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as("t"))
        .localCheckpoint())
    funnel.drop(1).foreach { step =>
      val prev = stages.head.select(col(userCol), col("t").as("t_prev"))
      stages ::= events.filter(col(typeCol) === step)
        .join(prev, Seq(userCol))
        .filter(col(tsCol) > col("t_prev"))
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as("t"))
        .localCheckpoint()
    }
    val counts = stages.reverse.zipWithIndex.map { case (s, i) =>
      s.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step_idx"), lit(funnel(i)).as("step"),
          col("n_users"))
    }
    counts.reduce(_ unionByName _)
  }
}
