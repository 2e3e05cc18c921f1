package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AlarmDispatchSpec extends SparkSpec {
  import spark.implicits._

  private def alarmsDf = Seq(
    // alarm 1: first dim unmapped, second maps to Host → dispatched to Host h1
    (1L, "a1", Seq(("Weird", "x"), ("HostId", "h1"), ("SvcId", "s1"))),
    // alarm 2: first dim null value → skipped, dispatches on SvcId
    (2L, "a2", Seq(("HostId", null.asInstanceOf[String]), ("SvcId", "s2"))),
    // alarm 3: empty value skipped, then unknown resource key → no match
    (3L, "a3", Seq(("HostId", ""), ("SvcId", "nope"))),
    // alarm 4: no mappable dims at all
    (4L, "a4", Seq(("Weird", "x"))),
    // alarm 5: also hits h1 → n_alarms=2 on h1
    (5L, "a5", Seq(("HostId", "h1")))
  ).toDF("alarm_id", "alarm_name", "raw")
    .select(col("alarm_id"), col("alarm_name"),
      expr("transform(raw, r -> struct(r._1 AS d_name, r._2 AS d_value))").as("dims"))

  private def hosts = Seq(("h1", "host-one"), ("h2", "host-two")).toDF("host_id", "hname")
  private def svcs = Seq(("s1", "svc-one"), ("s2", "svc-two")).toDF("svc_id", "sname")

  private def registry = Seq(
    AlarmDispatch.Dim("HostId", "Host", hosts, "host_id"),
    AlarmDispatch.Dim("SvcId", "Service", svcs, "svc_id"))

  test("first mappable non-empty dimension wins; unmapped/null/empty skip") {
    val out = AlarmDispatch(alarmsDf, registry)
      .select("alarm_id", "label", "resource_key").as[(Long, String, String)]
      .collect().toSet
    assert(out == Set(
      (1L, "Host", "h1"),    // Weird skipped, HostId taken (SvcId ignored)
      (2L, "Service", "s2"), // null HostId skipped
      (5L, "Host", "h1")
    )) // alarm 3 matches nothing; alarm 4 has no mappable dim
  }

  test("degraded marks aggregate per resource deterministically") {
    val out = AlarmDispatch.degraded(AlarmDispatch(alarmsDf, registry))
      .as[(String, String, Long, String, String)].collect().toSet
    assert(out == Set(
      ("Host", "h1", 2L, "a1", "degraded"),
      ("Service", "s2", 1L, "a2", "degraded")))
  }
}
