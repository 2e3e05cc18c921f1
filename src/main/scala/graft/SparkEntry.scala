package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.FlowRollup

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 re-expressed
  * Spark-first over the driver testdata; [[oracleSql]] carries the
  * DuckDB-equivalent ANSI SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_flow_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1+A2+A15 (+P1/P3): the reference's hot-path flow rollup —
    // etl_deepflow/neptune_etl_deepflow.py:633-646.
    "q_flow_rollup" -> ((s, dir) =>
      FlowRollup(
        Tables.events(s, dir),
        srcCol = "user_id",
        dstCol = "event_type",
        valueCol = "value",
        timePredicate = col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp"),
        errPredicate = col("value") >= 30.0
      ))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_flow_rollup" ->
      """SELECT user_id, event_type,
         count(*) AS calls,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
         count(*) FILTER (WHERE value >= 30.0) AS err_count,
         round(quantile_cont(value, 0.99), 4) AS p99_value
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
           AND user_id IS NOT NULL AND event_type IS NOT NULL
         GROUP BY user_id, event_type
         HAVING count(*) >= 2
         ORDER BY calls DESC, user_id, event_type
         LIMIT 100"""
  )
}
