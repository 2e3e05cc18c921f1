package graft.model

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-18 bounded-model localization contract: localized()
  * is bit-identical in rows and schema, and its plan is a driver-local
  * relation (so a broadcast over it builds without a Spark job). */
class LocalModelSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("localmodel-spec").getOrCreate()

  test("rows and schema are bit-identical to the source frame") {
    import spark.implicits._
    val src = (1 to 50).toDF("v")
      .groupBy((col("v") % 5).as("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
    val loc = LocalModel.localized(src)
    assert(loc.schema == src.schema)
    assert(loc.collect().map(_.toString).sorted.toSeq ==
      src.collect().map(_.toString).sorted.toSeq)
  }

  test("the localized frame plans as a local scan (no exchanges, no " +
      "source re-computation)") {
    import spark.implicits._
    val loc = LocalModel.localized((1 to 8).toDF("v"))
    val plan = loc.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") || plan.contains("LocalRelation"),
      s"expected a driver-local scan, got:\n$plan")
    assert(!plan.contains("Exchange"))
  }

  test("joining a big frame against a localized model broadcasts it") {
    import spark.implicits._
    val model = LocalModel.localized(
      (0 until 4).map(i => (i, i * 10)).toDF("k", "cv"))
    val big = (1 to 1000).toDF("x").withColumn("k", col("x") % 4)
    val joined = big.join(broadcast(model), "k")
    assert(joined.count() == 1000L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
