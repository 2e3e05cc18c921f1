package graft.model

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Events-table SCHEMA contract: the driver has regenerated
  * `events.parquet` with different physical `ts` encodings across rounds —
  * parquet TIMESTAMP(NANOS) read as epoch-nanos long (under
  * `nanosAsLong=true`), `timestamp[us]` `isAdjustedToUTC=false` (Spark
  * TIMESTAMP_NTZ), and `timestamp[us]` UTC-adjusted (Spark TIMESTAMP).
  * Round 8 shipped six silent query breaks when the NTZ layout appeared;
  * this spec writes the SAME instants in all three layouts and pins
  * `Tables.events` / `Tables.eventsSince` to identical results, so the
  * class of break is gated forever.
  */
class EventsSchemaContractSpec extends SparkSpec {

  // Distinct instants straddling the eventsSince cutoff used below, with
  // sub-second µs components to catch unit slips (ns vs µs vs s).
  private val instantsUs = Seq(
    1704585600000000L,          // 2024-01-07T00:00:00Z (before cutoff)
    1704671999999999L,          // 1 µs before the cutoff
    1704672000000000L,          // 2024-01-08T00:00:00Z (the cutoff itself)
    1704717323123456L,          // mid-day with µs precision
    1704758399999999L)          // end of 2024-01-08
  private val cutoffSeconds = 1704672000L

  private def writeLayouts(): String = {
    val dir = Files.createTempDirectory("events-layouts").toString
    val ids = instantsUs.indices.map(_.toLong)

    // Layout 1: nanos-as-long — what the TIMESTAMP(NANOS) testdata looks
    // like to Spark under spark.sql.legacy.parquet.nanosAsLong=true.
    val nanos = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ids.zip(instantsUs).map { case (i, us) => Row(us * 1000L, i) }, 1),
      StructType(Seq(StructField("ts", LongType), StructField("id", LongType))))
    nanos.write.parquet(s"$dir/nanos/events.parquet")

    // Layout 2: TIMESTAMP_NTZ — Spark writes TimestampNTZType as parquet
    // timestamp[us] isAdjustedToUTC=false, byte-identical to the
    // regenerated testdata's encoding.
    val ntz = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ids.zip(instantsUs).map { case (i, us) =>
          Row(java.time.LocalDateTime.ofEpochSecond(
            us / 1000000L, ((us % 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC), i)
        }, 1),
      StructType(Seq(
        StructField("ts", TimestampNTZType), StructField("id", LongType))))
    ntz.write.parquet(s"$dir/ntz/events.parquet")

    // Layout 3: µs-UTC TIMESTAMP (isAdjustedToUTC=true).
    val utc = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ids.zip(instantsUs).map { case (i, us) =>
          Row(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            us / 1000000L, (us % 1000000L) * 1000L)), i)
        }, 1),
      StructType(Seq(
        StructField("ts", TimestampType), StructField("id", LongType))))
    utc.write.parquet(s"$dir/utc/events.parquet")
    dir
  }

  private def instantsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("Tables.events yields identical instants for all three parquet layouts") {
    val dir = writeLayouts()
    val expected = instantsUs.indices.map(i => (i.toLong, instantsUs(i)))
    Seq("nanos", "ntz", "utc").foreach { layout =>
      val got = instantsOf(Tables.events(spark, s"$dir/$layout"))
      assert(got == expected, s"layout=$layout")
      // every layout must normalize to TIMESTAMP so time functions resolve
      assert(Tables.events(spark, s"$dir/$layout").schema("ts").dataType ==
        TimestampType, s"layout=$layout dtype")
    }
  }

  test("Tables.eventsSince filters the same rows and pushes down in every layout") {
    val dir = writeLayouts()
    val expected = instantsUs.indices.map(i => (i.toLong, instantsUs(i)))
      .filter(_._2 >= cutoffSeconds * 1000000L)
    Seq("nanos", "ntz", "utc").foreach { layout =>
      val df = Tables.eventsSince(spark, s"$dir/$layout", cutoffSeconds)
      assert(instantsOf(df) == expected, s"layout=$layout")
      // the range predicate must reach the scan as a pushed filter in the
      // scan column's OWN type (long / ntz / utc literal) — the 100 TB
      // row-group-skipping contract, independent of testdata generation
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("PushedFilters:") &&
        "GreaterThanOrEqual\\(ts,[^)]+\\)".r.findFirstIn(p).isDefined,
        s"layout=$layout predicate not pushed:\n${p.take(600)}")
    }
  }
}
