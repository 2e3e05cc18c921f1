package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-dependency audit — "does column A determine column B"
  * checked exactly over the whole table: the schema-inference /
  * data-contract profiling pass a pipeline runs before trusting a key
  * (is `order → customer` really single-valued? did a backfill break
  * `entity → canonical_name`?). Extends the [[Expectations]] family
  * from per-row rules to CROSS-ROW structural invariants.
  *
  * Per candidate pair (det → dep) the audit reports, exactly:
  *   n_groups            distinct determinant values,
  *   n_violating         determinant values with > 1 distinct dependent,
  *   max_distinct_dep    the worst group's dependent cardinality,
  *   holds               n_violating == 0.
  *
  * NULL semantics (stated, not accidental): a NULL determinant is a
  * group like any other (SQL GROUP BY semantics — two NULL-keyed rows
  * land together); NULL dependents are invisible to the distinct count
  * (count(DISTINCT dep) ignores NULLs), so a group holding one value
  * plus NULLs still satisfies the dependency. Callers wanting
  * NULL-strict reads pre-coalesce to a sentinel.
  *
  * Shape for 100 TB: per pair, one two-level aggregate —
  * (det, dep) distinct collapse, then a partial-aggregatable rollup to
  * the 4-number summary; pairs are independent single-row outputs
  * unioned. No window, no join, cost O(rows·pairs) scan work.
  */
object FdAudit {

  /** @param pairs (determinant, dependent) column-name pairs
    * @return one row per pair: (det, dep, n_groups, n_violating,
    *         max_distinct_dep, holds). */
  def audit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one (det, dep) pair")
    pairs.map { case (det, dep) =>
      df.groupBy(col(det).as("k"))
        .agg(countDistinct(col(dep)).as("nd"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("nd")).as("max_distinct_dep"))
        .select(lit(det).as("det"), lit(dep).as("dep"),
          col("n_groups"), col("n_violating"), col("max_distinct_dep"),
          (col("n_violating") === 0).as("holds"))
    }.reduce(_ unionByName _)
  }
}
