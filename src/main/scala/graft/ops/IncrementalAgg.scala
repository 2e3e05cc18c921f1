package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the pattern behind every
  * scheduled ETL rollup: keep a small per-key STATE table of mergeable
  * partials (count / sum / min / max), fold each new batch in with one
  * aggregate + one full-outer merge, and never rescan history. Derived
  * measures (avg) come from the partials at read time.
  *
  * Correctness contract: `merge(state(A), B) ≡ state(A ∪ B)` for any
  * batch split — the algebraic-aggregate property, spec-asserted and
  * oracle-proven (q_incr_agg recomputes from scratch in SQL). Sums ride
  * decimal(18,2) so the identity holds bit-exactly regardless of
  * addition order (a double sum would drift between the incremental
  * and recomputed paths).
  *
  * Shape for 100 TB: the batch aggregates FIRST (map-side combine cuts
  * it to one row per touched key), then merges against state on the
  * key — the same one-shuffle full-outer pattern as [[MergeUpsert]];
  * state size is keys, not history. This is the batch twin of the
  * streaming state in [[graft.streaming.FlowStream]].
  */
object IncrementalAgg {

  /** Build the partials state from rows: (keys, cnt, sum_v, min_v, max_v). */
  def aggregate(df: DataFrame, keys: Seq[String], valCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one key")
    df.groupBy(keys.map(col): _*)
      .agg(count(col(valCol)).as("cnt"),
        sum(col(valCol).cast("decimal(18,2)")).as("sum_v"),
        min(col(valCol)).as("min_v"),
        max(col(valCol)).as("max_v"))
  }

  /** Fold a raw batch into an existing state table. */
  def merge(state: DataFrame, batch: DataFrame, keys: Seq[String],
      valCol: String): DataFrame = {
    val b = aggregate(batch, keys, valCol)
      .withColumnsRenamed(Map("cnt" -> "b_cnt", "sum_v" -> "b_sum",
        "min_v" -> "b_min", "max_v" -> "b_max"))
    state.join(b, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("b_cnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("sum_v"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("b_sum"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("sum_v"),
        least(col("min_v"), col("b_min")).as("min_v"),
        greatest(col("max_v"), col("b_max")).as("max_v")): _*)
  }

  /** Read-time derivation: adds `avg_v` from the exact partials. */
  def withDerived(state: DataFrame): DataFrame =
    state.withColumn("avg_v",
      (col("sum_v").cast("double") / col("cnt")))
}
