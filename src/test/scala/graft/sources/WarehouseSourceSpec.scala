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
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.length === 1, df.queryExecution.executedPlan.toString)
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

  test("filter + prune pushdown: compiled filters vanish from the Spark " +
      "plan and the SELECT list shrinks to the required columns") {
    val df = staged()
      .filter(col("event_type") === "click" && col("cents") >= 500L)
      .select("event_id", "cents")
    val scan = scanOf(df)
    assert(scan.description()
      .contains("SELECT event_id, cents FROM spec_events"), scan.description())
    assert(scan.description().contains("event_type = 'click'"))
    // both predicates compiled → no FilterExec left above the scan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("), plan)
    assert(df.as[(Long, Long)].collect().toSet === Set((2L, 750L), (4L, 1250L)))
  }

  test("avg over an integer column decomposes: SUM+COUNT push to the " +
      "warehouse exactly, the one float division stays in a Spark Project") {
    val df = staged().groupBy(col("event_type"))
      .agg(avg(col("cents")).as("avg_cents"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      plan)
    assert(scanOf(df).description()
      .contains("SUM(cents), COUNT(cents)"), scanOf(df).description())
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
    val df = staged()
      .filter(col("event_type") =!= "purchase")
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
