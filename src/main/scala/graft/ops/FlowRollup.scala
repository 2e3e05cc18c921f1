package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's hot-path flow rollup (A1+A2+A15 in SURVEY.md §2.5):
  * `lambda/etl_deepflow/neptune_etl_deepflow.py:633-646` groups the last
  * N minutes of L7 flow rows by (src, dst, port, protocol), computes
  * `count() / avg(response_duration) / countIf(err) / quantile(0.99)`,
  * keeps groups with `calls >= 2` and takes the top-100 by calls.
  *
  * Spark-first re-expression: Filter → partial+final HashAggregate →
  * TakeOrderedAndProject. The time filter lands on the parquet scan as a
  * pushed predicate; the topK never materializes a global sort (Spark plans
  * `TakeOrderedAndProject`, a per-partition heap + driver merge), so the
  * operator is 100 TB-safe: one shuffle on the group keys, nothing else.
  *
  * Numeric determinism for the DuckDB oracle: sums go through
  * `decimal(18,2)` (exact, order-independent) before the final cast to
  * double; the p99 uses Spark's exact `percentile` (interpolating, same
  * definition as DuckDB `quantile_cont`) rounded to 4 dp.
  */
object FlowRollup {
  def apply(
      flows: DataFrame,
      srcCol: String,
      dstCol: String,
      valueCol: String,
      timePredicate: Column,
      errPredicate: Column,
      minCalls: Long = 2L,
      topK: Int = 100
  ): DataFrame = {
    val v = col(valueCol)
    flows
      .filter(timePredicate && col(srcCol).isNotNull && col(dstCol).isNotNull)
      .groupBy(col(srcCol), col(dstCol))
      .agg(
        count(lit(1)).as("calls"),
        (sum(v.cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_value"),
        count(when(errPredicate, 1)).as("err_count"),
        round(expr(s"percentile($valueCol, 0.99)"), 4).as("p99_value")
      )
      .filter(col("calls") >= minCalls)
      .orderBy(col("calls").desc, col(srcCol), col(dstCol))
      .limit(topK)
  }
}
