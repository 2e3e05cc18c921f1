package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Plan contracts for the DSv2 warehouse source: the pushed state must
  * actually LEAVE the Spark side — an aggregate that is "pushed" but
  * still planned as HashAggregate would be the reference's anti-pattern
  * (fetch raw rows, reduce in the client) wearing a pushdown label. */
class WarehouseSourceSpec extends SparkSpec {
  import spark.implicits._

  private val url = Warehouse.memoryUrl("graftwh_spec")

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
      url, "spec_events")
    spark.read.format("graft.sources.WarehouseSource")
      .option("url", url).option("dbtable", "spec_events").load()
  }

  private def scanOf(df: DataFrame): WarehouseScan = {
    // traverse into AQE wrappers (multi-shard plans carry an Exchange,
    // so the scan sits under AdaptiveSparkPlanExec)
    val top = df.queryExecution.executedPlan
    val plans = top +: top.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }
    val scans = plans.flatMap(_.collect { case b: BatchScanExec => b.scan })
    assert(scans.length === 1, top.toString)
    scans.head.asInstanceOf[WarehouseScan]
  }

  test("schema inference maps warehouse types back to Spark") {
    val df = staged()
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq("event_id" -> "bigint", "user_id" -> "bigint",
        "event_type" -> "string", "cents" -> "bigint",
        "score" -> "double"))
  }

  test("complete aggregate pushdown: no Aggregate exec node remains; " +
      "the warehouse computes the rollup") {
    val df = staged()
      .filter(col("cents") >= 500L)
      .groupBy(col("event_type"))
      .agg(count(col("event_id")).as("n_events"),
        sum(col("cents")).as("sum_cents"),
        max(col("user_id")).as("max_user"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      plan)
    val scan = scanOf(df)
    assert(scan.description().contains("PushedAggregation: true"))
    assert(scan.description().contains("GROUP BY event_type"),
      scan.description())
    assert(scan.description().contains("cents >= 500"), scan.description())
    val got = df.as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("click", 2L, 2000L, 12L), ("view", 1L, 600L, 11L),
      ("purchase", 1L, 9000L, 13L)))
  }

  test("global (no group-by) aggregate pushes completely too") {
    val df = staged().agg(count(col("event_id")).as("n"),
      sum(col("cents")).as("total"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      plan)
    assert(df.as[(Long, Long)].collect().toSeq === Seq((6L, 11950L)))
  }

  test("filter + prune pushdown: compiled filters reach the warehouse " +
      "and the SELECT list shrinks; string equality keeps a residual " +
      "Spark twin (padded-comparison caveat), numeric filters do not") {
    val df = staged()
      .filter(col("event_type") === "click" && col("cents") >= 500L)
      .select("event_id", "cents")
    val scan = scanOf(df)
    // event_type rides along in the SELECT list: the residual twin
    // needs the column Spark-side (the price of exact string equality)
    assert(scan.description()
      .contains("SELECT event_id, event_type, cents FROM spec_events"),
      scan.description())
    assert(scan.description().contains("event_type = 'click'"))
    assert(scan.description().contains("cents >= 500"))
    // the string predicate is re-checked Spark-side (Derby compares
    // VARCHAR with trailing blanks insignificant — the push alone
    // would admit 'click '); the numeric one is NOT re-checked
    val filters = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Filter (")).toSeq
    assert(filters.nonEmpty && filters.forall(l =>
      l.contains("event_type") && !l.contains("cents")), filters.mkString("\n"))
    assert(df.as[(Long, Long)].collect().toSet === Set((2L, 750L), (4L, 1250L)))
  }

  test("padded-comparison divergence is closed by the residual twin: a " +
      "trailing-blank value never leaks through pushed string equality") {
    Warehouse.stage(
      Seq((1L, "click", 10L), (2L, "click ", 20L), (3L, "view", 30L))
        .toDF("event_id", "event_type", "cents"),
      url, "spec_padded")
    val df = spark.read.format("graft.sources.WarehouseSource")
      .option("url", url).option("dbtable", "spec_padded").load()
      .filter(col("event_type") === "click")
    // Derby's padded comparison returns rows 1 AND 2 for the pushed
    // WHERE; Spark's residual re-check must drop the trailing-blank row
    assert(df.select("event_id").as[Long].collect().toSet === Set(1L))
  }

  test("avg over an integer column decomposes: SUM+COUNT push to the " +
      "warehouse exactly, the one float division stays in a Spark Project") {
    val df = staged().groupBy(col("event_type"))
      .agg(avg(col("cents")).as("avg_cents"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      plan)
    assert(scanOf(df).description()
      .contains("SUM(cents) AS agg_0, COUNT(cents) AS agg_1"),
      scanOf(df).description())
    val got = df.as[(String, Double)].collect().toMap
    assert(got("click") === 750.0 && got("view") === 350.0 &&
      got("purchase") === 9000.0)
  }

  test("a float sum falls back whole: Spark keeps the aggregation, values " +
      "unchanged (all-or-nothing contract — no pushed float accumulation)") {
    val df = staged().groupBy(col("event_type"))
      .agg(sum(col("score")).as("sum_score"), max(col("cents")).as("max_cents"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    val gotM = df.collect().map(r => r.getString(0) -> (r.getDouble(1),
      r.getLong(2))).toMap
    assert(gotM("click") === ((6.0, 1250L)) && gotM("view") === ((2.25, 600L))
      && gotM("purchase") === ((8.0, 9000L)))
  }

  test("top-N pushes whole: ORDER BY + FETCH FIRST compile into the " +
      "warehouse query and Spark's Sort/Limit vanish") {
    // numeric filter: a STRING filter would (correctly) block the topN
    // push below its residual Spark-side twin
    val df = staged()
      .filter(col("cents") < 9000L)
      .select("event_id", "cents")
      .orderBy(col("cents").desc, col("event_id"))
      .limit(3)
    val scan = scanOf(df)
    assert(scan.description().contains(
      "ORDER BY cents DESC NULLS LAST, event_id ASC NULLS FIRST"),
      scan.description())
    assert(scan.description().contains("FETCH FIRST 3 ROWS ONLY"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("Sort "),
      plan)
    // exact rows in exact order: the warehouse's cut IS the global cut
    assert(df.as[(Long, Long)].collect().toSeq ===
      Seq((4L, 1250L), (2L, 750L), (3L, 600L)))
  }

  test("bare limit pushes as FETCH FIRST; Spark keeps no Limit node") {
    val df = staged().select("event_id").limit(2)
    val scan = scanOf(df)
    assert(scan.description().contains("FETCH FIRST 2 ROWS ONLY"),
      scan.description())
    assert(df.count() === 2)
  }

  // ── sharded posture (review r15 #4): dbtable = comma-separated
  //    shard list; complete pushdown is refused and Spark plans the
  //    final merge over per-shard partials ───────────────────────────

  private def stagedSharded(): DataFrame = {
    val rows = Seq(
      (1L, 10L, "click", 250L), (2L, 10L, "click", 750L),
      (3L, 11L, "view", 600L), (4L, 12L, "click", 1250L),
      (5L, 12L, "view", 100L), (6L, 13L, "purchase", 9000L))
    Warehouse.stage(rows.filter(_._1 % 2 == 1)
      .toDF("event_id", "user_id", "event_type", "cents"), url, "spec_sh0")
    Warehouse.stage(rows.filter(_._1 % 2 == 0)
      .toDF("event_id", "user_id", "event_type", "cents"), url, "spec_sh1")
    spark.read.format("graft.sources.WarehouseSource")
      .option("url", url).option("dbtable", "spec_sh0, spec_sh1").load()
  }

  test("sharded partial aggregate pushdown: per-shard GROUP BY partials " +
      "ship, a Spark-side FINAL Aggregate merges them (min of mins, sum " +
      "of sums, sum of counts) — the 100x-scale posture") {
    val df = stagedSharded()
      .filter(col("cents") >= 500L)
      .groupBy(col("event_type"))
      .agg(count(col("event_id")).as("n_events"),
        sum(col("cents")).as("sum_cents"),
        max(col("user_id")).as("max_user"))
    val plan = df.queryExecution.executedPlan.toString
    // the final merge EXISTS on the Spark side…
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      plan)
    // …but it merges pushed partials, not raw rows
    val scan = scanOf(df)
    assert(scan.description().contains("PushedAggregation: true"),
      scan.description())
    assert(scan.description().contains("GROUP BY event_type"))
    assert(scan.description().contains("spec_sh0") &&
      scan.description().contains("spec_sh1"), scan.description())
    val got = df.as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("click", 2L, 2000L, 12L), ("view", 1L, 600L, 11L),
      ("purchase", 1L, 9000L, 13L)))
  }

  test("sharded global aggregate (no group-by) merges partials exactly") {
    val df = stagedSharded().agg(count(col("event_id")).as("n"),
      sum(col("cents")).as("total"), min(col("user_id")).as("lo"))
    assert(scanOf(df).description().contains("PushedAggregation: true"))
    assert(df.as[(Long, Long, Long)].collect().toSeq === Seq((6L, 11950L, 10L)))
  }

  test("sharded DISTINCT aggregate pushes as a PER-SHARD DEDUP " +
      "(DistinctAggThroughShards, review r16 #4): each shard ships its " +
      "GROUP BY g, x pairs, Spark dedups across shards and counts") {
    val df = stagedSharded().groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nu"))
    val scan = scanOf(df)
    // plan contract: per-shard grouped scan below a Spark-side
    // distinct/aggregate — NOT a raw-row scan, NOT a pushed COUNT
    assert(scan.description().contains("PushedAggregation: true"),
      scan.description())
    assert(scan.description().contains("GROUP BY event_type, user_id"),
      scan.description())
    assert(!scan.description().contains("COUNT"), scan.description())
    assert(scan.description().contains("spec_sh0") &&
      scan.description().contains("spec_sh1"), scan.description())
    // the count itself stays Spark-side (two aggregates above the scan)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      plan)
    val got = df.as[(String, Long)].collect().toMap
    assert(got === Map("click" -> 2L, "view" -> 2L, "purchase" -> 1L))
  }

  test("the dedup rewrite keeps pushed filters and handles " +
      "sum(DISTINCT) and a NULL-keeping dedup exactly") {
    // sum(distinct cents) with a pushed range filter: the filter
    // compiles into the per-shard GROUP BY query; duplicate cents
    // values within and across shards count once
    val df = stagedSharded().filter(col("cents") >= 600L)
      .groupBy(col("event_type"))
      .agg(sum_distinct(col("cents")).as("sd"))
    val scan = scanOf(df)
    assert(scan.description().contains("GROUP BY event_type, cents"),
      scan.description())
    assert(scan.description().contains("cents >= 600"), scan.description())
    val got = df.as[(String, Long)].collect().toMap
    // staged rows (cents): click 750+1250, view 600 (×1 kept by filter),
    // purchase 9000 — no duplicate values here, sums are plain
    assert(got === Map("click" -> 2000L, "view" -> 600L,
      "purchase" -> 9000L))
  }

  test("single-table DISTINCT still pushes COMPLETE (one SQL answer " +
      "beats the dedup rewrite — the rule must not fire)") {
    val df = staged().groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nu"))
    val scan = scanOf(df)
    assert(scan.description().contains("COUNT(DISTINCT user_id)"),
      scan.description())
    val got = df.as[(String, Long)].collect().toMap
    assert(got === Map("click" -> 2L, "view" -> 2L, "purchase" -> 1L))
  }

  test("sharded top-N pushes per shard (each ships at most N rows) and " +
      "Spark keeps the global re-sort/cut — isPartiallyPushed") {
    val df = stagedSharded()
      .select("event_id", "cents")
      .orderBy(col("cents").desc, col("event_id"))
      .limit(3)
    val scan = scanOf(df)
    assert(scan.description().contains("FETCH FIRST 3 ROWS ONLY"),
      scan.description())
    assert(scan.description().contains(
      "ORDER BY cents DESC NULLS LAST, event_id ASC NULLS FIRST"))
    // the global cut survives on the Spark side
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("Sort"),
      plan)
    assert(df.as[(Long, Long)].collect().toSeq ===
      Seq((6L, 9000L), (4L, 1250L), (2L, 750L)))
  }

  test("residual filter stays on the Spark side without breaking the push " +
      "of its compilable siblings") {
    // endsWith over a column computed?? no — contains compiles; a modulo
    // arithmetic predicate does not (no V1 Filter form, arrives as residual)
    val df = staged().filter(col("event_id") % 2 === 0 &&
      col("event_type").startsWith("c"))
    val scan = scanOf(df)
    assert(scan.description().contains("LIKE 'c%'"), scan.description())
    assert(df.select("event_id").as[Long].collect().toSet === Set(2L, 4L))
  }
}
