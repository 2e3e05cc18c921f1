package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet-backed table loaders for the engine's relational surface.
  *
  * The reference's three input surfaces (ClickHouse flow logs, AWS resource
  * snapshots, CFN templates — SURVEY.md §1.2) are modeled by the driver's
  * TPC-H-ish testdata (TESTDATA.md): `events` plays the flow-log fact
  * stream, `nation`/`region` the tiny broadcast dims, `customer`/`orders`/
  * `lineitem` the resource/fact tables, `documents`/`embeddings` the
  * LLM-pipeline corpus.
  *
  * All access goes through `spark.read.parquet` so Catalyst gets predicate
  * pushdown, column pruning and partition pruning for free — at 100 TB the
  * same loaders point at a partitioned table root instead of a single file.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.parquet` stores `ts` as TIMESTAMP(NANOS), which Spark's
    * vectorized reader doesn't support. With
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a long of
    * epoch-nanos; convert to a microsecond timestamp (floor division —
    * exactly what DuckDB does internally, so oracle parity holds).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      // NB: integer division — epoch-nanos overflow double's 53-bit mantissa,
      // so `col/1000` (double div) would round off by up to ±1 µs.
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }

  /** Events with the time-window predicate applied BEFORE the ns→µs
    * conversion, so it pushes to the parquet scan as a raw int64 range
    * (`PushedFilters: [GreaterThanOrEqual(ts, …)]` → row-group skipping).
    * A filter on the converted column cannot push through
    * `timestamp_micros`, which at 100 TB means a full scan — this loader
    * is the hot-path variant (P1, `etl_deepflow:641`).
    * @param cutoffSeconds inclusive lower bound, epoch seconds UTC. */
  def eventsSince(s: SparkSession, d: String, cutoffSeconds: Long): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.filter(col("ts") >= cutoffSeconds * 1000000000L)
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw.filter(col("ts") >= timestamp_seconds(lit(cutoffSeconds)))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
