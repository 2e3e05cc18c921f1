package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The warehouse source against a SECOND live engine (review r16 #5):
  * every pushdown contract the Derby suite pins — complete aggregate
  * push, filter+prune, top-N/limit, sharded partials, the DISTINCT
  * dedup rewrite — re-run against embedded DuckDB through the
  * [[WarehouseDialect]] seam. The round-15 padded-comparison finding
  * proved dialect divergence changes ANSWERS, not just syntax; this
  * suite is the proof the compiled-SQL surface is general, not
  * Derby-shaped — including the one deliberate behavioral divergence:
  * DuckDB compares strings binary-exact, so pushed string predicates
  * carry NO residual Spark twin (the dialect's padded flag).
  *
  * Cancels (not fails) when the DuckDB jar is absent from the test
  * classpath — the jar is test-scope unmanaged, never a library
  * dependency.
  */
class DuckDbWarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def duckAvailable: Boolean =
    try { Class.forName("org.duckdb.DuckDBDriver"); true }
    catch { case _: Throwable => false }

  // file-backed: DuckDB's bare in-memory URL is PER-CONNECTION (each
  // getConnection would see an empty database); a file path shares
  // one database across the staging and executor-side reader
  // connections, like a real warehouse endpoint would
  private lazy val url = {
    val dir = Files.createTempDirectory("graft-duck")
    s"jdbc:duckdb:$dir/wh.db"
  }

  private def staged(): DataFrame = {
    Warehouse.stage(
      Seq(
        (1L, 10L, "click", 250L, 0.5),
        (2L, 10L, "click", 750L, 1.5),
        (3L, 11L, "view", 600L, 2.0),
        (4L, 12L, "click", 1250L, 4.0),
        (5L, 12L, "view", 100L, 0.25),
        (6L, 13L, "purchase", 9000L, 8.0)
      ).toDF("event_id", "user_id", "event_type", "cents", "score"),
      url, "duck_events")
    spark.read.format("graft.sources.WarehouseSource")
      .option("url", url).option("dbtable", "duck_events").load()
  }

  private def stagedSharded(): DataFrame = {
    val rows = Seq(
      (1L, 10L, "click", 250L), (2L, 10L, "click", 750L),
      (3L, 11L, "view", 600L), (4L, 12L, "click", 1250L),
      (5L, 12L, "view", 100L), (6L, 13L, "purchase", 9000L))
    val (a, b) = rows.partition(_._1 % 2 == 1)
    Warehouse.stage(a.toDF("event_id", "user_id", "event_type", "cents"),
      url, "duck_sh0")
    Warehouse.stage(b.toDF("event_id", "user_id", "event_type", "cents"),
      url, "duck_sh1")
    spark.read.format("graft.sources.WarehouseSource")
      .option("url", url).option("dbtable", "duck_sh0,duck_sh1").load()
  }

  private def scanOf(df: DataFrame): WarehouseScan = {
    val top = df.queryExecution.executedPlan
    val plans = top +: top.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }
    val scans = plans.flatMap(_.collect { case b: BatchScanExec => b.scan })
    assert(scans.length === 1, top.toString)
    scans.head.asInstanceOf[WarehouseScan]
  }

  test("dialect resolution: derby/duckdb/unknown URLs map to the right " +
      "dialects; unknown is conservative (padded strings assumed)") {
    assert(WarehouseDialect.of("jdbc:derby:memory:x").name === "derby")
    assert(WarehouseDialect.of("jdbc:duckdb:/x.db").name === "duckdb")
    assert(WarehouseDialect.of("jdbc:postgresql://h/d").name === "generic")
    assert(WarehouseDialect.of("jdbc:postgresql://h/d")
      .paddedStringComparison)
    assert(!WarehouseDialect.of("jdbc:duckdb:").paddedStringComparison)
  }

  test("schema inference over DuckDB maps back to Spark") {
    assume(duckAvailable)
    val df = staged()
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq("event_id" -> "bigint", "user_id" -> "bigint",
        "event_type" -> "string", "cents" -> "bigint",
        "score" -> "double"))
  }

  test("complete aggregate pushdown runs inside DuckDB: no Aggregate " +
      "node, same values as Derby's contract") {
    assume(duckAvailable)
    val df = staged()
      .filter(col("cents") >= 500L)
      .groupBy(col("event_type"))
      .agg(count(col("event_id")).as("n_events"),
        sum(col("cents")).as("sum_cents"),
        max(col("user_id")).as("max_user"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      plan)
    assert(scanOf(df).description().contains("PushedAggregation: true"))
    val got = df.as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("click", 2L, 2000L, 12L), ("view", 1L, 600L, 11L),
      ("purchase", 1L, 9000L, 13L)))
  }

  test("binary-exact dialect: pushed string equality keeps NO residual " +
      "Spark twin (the Derby twin is the padded-dialect tax, not a " +
      "fixed cost) and stays exact on trailing blanks") {
    assume(duckAvailable)
    Warehouse.stage(
      Seq((1L, "click"), (2L, "click ")).toDF("id", "et"),
      url, "duck_pad")
    val df = spark.read.format("graft.sources.WarehouseSource")
      .option("url", url).option("dbtable", "duck_pad").load()
      .filter(col("et") === "click")
    // no Spark-side Filter re-check NODE: the scan's answer is final
    // (match exec nodes, not the description text — "PushedFilters:"
    // contains the word)
    val filterNodes = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(filterNodes.isEmpty, df.queryExecution.executedPlan.toString)
    assert(scanOf(df).description().contains("et = 'click'"))
    // and DuckDB itself compares binary-exact: 'click ' is NOT returned
    assert(df.select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("top-N pushes whole into DuckDB (FETCH FIRST + NULLS ordering)") {
    assume(duckAvailable)
    val df = staged()
      .select("event_id", "cents")
      .orderBy(col("cents").desc, col("event_id"))
      .limit(3)
    val scan = scanOf(df)
    assert(scan.description().contains("FETCH FIRST 3 ROWS ONLY"),
      scan.description())
    assert(scan.description().contains(
      "ORDER BY cents DESC NULLS LAST, event_id ASC NULLS FIRST"))
    assert(df.as[(Long, Long)].collect().toSeq ===
      Seq((6L, 9000L), (4L, 1250L), (2L, 750L)))
  }

  test("sharded partial aggregate merges per-DuckDB-shard partials") {
    assume(duckAvailable)
    val df = stagedSharded()
      .filter(col("cents") >= 500L)
      .groupBy(col("event_type"))
      .agg(count(col("event_id")).as("n_events"),
        sum(col("cents")).as("sum_cents"),
        max(col("user_id")).as("max_user"))
    val scan = scanOf(df)
    assert(scan.description().contains("PushedAggregation: true"))
    assert(scan.description().contains("duck_sh0") &&
      scan.description().contains("duck_sh1"), scan.description())
    val got = df.as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("click", 2L, 2000L, 12L), ("view", 1L, 600L, 11L),
      ("purchase", 1L, 9000L, 13L)))
  }

  test("sharded DISTINCT dedup rewrite compiles per-DuckDB-shard " +
      "GROUP BY g, x (DistinctAggThroughShards is dialect-agnostic)") {
    assume(duckAvailable)
    val df = stagedSharded().groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nu"))
    val scan = scanOf(df)
    assert(scan.description().contains("GROUP BY event_type, user_id"),
      scan.description())
    assert(!scan.description().contains("COUNT"), scan.description())
    val got = df.as[(String, Long)].collect().toMap
    assert(got === Map("click" -> 2L, "view" -> 2L, "purchase" -> 1L))
  }

  test("single-table DISTINCT pushes COMPLETE into DuckDB") {
    assume(duckAvailable)
    val df = staged().groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nu"))
    assert(scanOf(df).description().contains("COUNT(DISTINCT user_id)"))
    val got = df.as[(String, Long)].collect().toMap
    assert(got === Map("click" -> 2L, "view" -> 2L, "purchase" -> 1L))
  }

  test("cross-dialect parity: the q_warehouse_rollup shape computes " +
      "identical rows on Derby and DuckDB from identical staging") {
    assume(duckAvailable)
    val rows = Seq(
      (1L, 10L, "click", 250L, 0.5), (2L, 10L, "click", 750L, 1.5),
      (3L, 11L, "view", 600L, 2.0), (4L, 12L, "click", 1250L, 4.0),
      (5L, 12L, "view", 100L, 0.25), (6L, 13L, "purchase", 9000L, 8.0))
      .toDF("event_id", "user_id", "event_type", "cents", "score")
    def rollup(u: String, t: String) = {
      Warehouse.stage(rows, u, t)
      spark.read.format("graft.sources.WarehouseSource")
        .option("url", u).option("dbtable", t).load()
        .filter(col("cents") >= 500L)
        .groupBy(col("event_type"))
        .agg(count(col("event_id")).as("n_events"),
          sum(col("cents")).as("sum_cents"),
          max(col("user_id")).as("max_user"))
        .as[(String, Long, Long, Long)].collect().toSet
    }
    val derby = rollup(Warehouse.memoryUrl("duckparity"), "par_events")
    val duck = rollup(url, "par_events")
    assert(derby === duck)
    assert(derby.nonEmpty)
  }
}
