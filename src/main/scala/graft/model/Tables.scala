package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** `events.parquet` has shipped `ts` in three physical layouts across
    * testdata generations; all three must yield the SAME µs-UTC `TIMESTAMP`
    * instants (the oracle's DuckDB `TIMESTAMP` is naive-UTC, so parity
    * requires a UTC session zone, which every entrypoint sets):
    *   - parquet TIMESTAMP(NANOS): unsupported by the vectorized reader;
    *     with `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a
    *     long of epoch-nanos — floor-divide to µs (DuckDB's own semantics).
    *   - parquet timestamp[us] isAdjustedToUTC=false → Spark TIMESTAMP_NTZ:
    *     the wall-clock IS the UTC instant; a cast under the UTC session
    *     zone is instant-preserving and keeps `unix_micros` et al. legal.
    *   - parquet timestamp[us] UTC-adjusted → Spark TIMESTAMP: pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      // NB: integer division — epoch-nanos overflow double's 53-bit mantissa,
      // so `col/1000` (double div) would round off by up to ±1 µs.
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
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
    raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") >= cutoffSeconds * 1000000000L)
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // filter BEFORE the cast with an NTZ literal (LocalDateTime) so the
        // predicate is same-typed against the scan column and pushes as a
        // parquet row-group filter; filtering the cast column would not.
        raw.filter(col("ts") >= lit(java.time.LocalDateTime
            .ofEpochSecond(cutoffSeconds, 0, java.time.ZoneOffset.UTC)))
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw.filter(col("ts") >= timestamp_seconds(lit(cutoffSeconds)))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
