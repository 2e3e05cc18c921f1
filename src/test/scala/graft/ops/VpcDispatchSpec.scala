package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VpcDispatchSpec extends SparkSpec {
  import spark.implicits._

  private def instances = Seq((1L, "v1"), (2L, "v1"), (3L, "v2"), (4L, "v9"))
    .toDF("inst_id", "vpc_id")
  private def monitors = Seq((10L, "m-a"), (20L, "m-b"), (30L, "m-global"))
    .toDF("monitor_id", "monitor_name")
  // m-a watches v1, m-b watches v2 and v3; m-global declares no vpc
  private def monitorVpcs = Seq((10L, "v1"), (20L, "v2"), (20L, "v3"))
    .toDF("monitor_id", "vpc_id")

  test("vpc members inherit their monitor; no-vpc monitors reach everyone") {
    val out = VpcDispatch(instances, "vpc_id", monitors, "monitor_id", monitorVpcs)
      .select("inst_id", "monitor_id", "via").as[(Long, Long, String)]
      .collect().toSet
    val expected =
      Set((1L, 10L, "vpc"), (2L, 10L, "vpc"), (3L, 20L, "vpc")) ++
        instances.select("inst_id").as[Long].collect()
          .map(i => (i, 30L, "fallback")).toSet
    assert(out == expected) // inst 4 (vpc v9) only gets the global monitor
  }

  test("duplicate membership rows do not duplicate dispatch output") {
    val dup = monitorVpcs.union(monitorVpcs) // every membership row twice
    val out = VpcDispatch(instances, "vpc_id", monitors, "monitor_id", dup)
    assert(out.filter(col("via") === "vpc").count() == 3L)
  }

  test("no-fallback case: all monitors declare vpcs, no cross rows") {
    val out = VpcDispatch(instances, "vpc_id",
      monitors.filter(col("monitor_id") =!= 30L), "monitor_id", monitorVpcs)
    assert(out.filter(col("via") === "fallback").count() == 0L)
    assert(out.count() == 3L)
  }

  test("the only nested-loop join is the broadcast fallback") {
    val plan = VpcDispatch(instances, "vpc_id", monitors, "monitor_id",
      monitorVpcs).queryExecution.executedPlan.toString
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 1)
    assert(!plan.contains("CartesianProduct"))
  }
}
