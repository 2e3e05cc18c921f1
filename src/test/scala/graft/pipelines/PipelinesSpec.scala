package graft.pipelines

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flowGraph: rollup + dim resolve drops unresolvable sources (P5)") {
    val flows = Seq(
      (1L, "api", 10.0, ts("2024-01-02 00:00:00")),
      (1L, "api", 20.0, ts("2024-01-02 00:01:00")),
      (999L, "api", 5.0, ts("2024-01-02 00:00:00")), // unresolvable key
      (999L, "api", 6.0, ts("2024-01-02 00:01:00"))
    ).toDF("user_id", "event_type", "value", "ts")
    val dim = Seq((1L, "svc-one")).toDF("service_key", "service_name")
    val out = Pipelines.flowGraph(flows, dim, "user_id", "event_type", "value",
      timePredicate = lit(true), errPredicate = $"value" >= 15.0)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("src_service") == "svc-one")
    assert(out.head.getAs[Long]("calls") == 2)
    assert(out.head.getAs[Long]("err_count") == 1)
  }

  test("topology: merge + reset-then-degrade + GC in one pass") {
    val store = Seq(
      ("EC2", "i-1", "degraded", 1L), // recovers: no alarm this run
      ("EC2", "i-2", "healthy", 1L),  // degrades: alarming
      ("EC2", "i-gone", "healthy", 1L) // GC'd: not in snapshot
    ).toDF("label", "name", "health_status", "last_updated")
    val snapshot = Seq(("EC2", "i-1"), ("EC2", "i-2"), ("EC2", "i-new"))
      .toDF("label", "name")
    val alarms = Seq(("EC2", "i-2")).toDF("label", "name")

    val out = Pipelines.topology(store, snapshot, alarms, runStamp = 2L)
      .collect().map(r => r.getAs[String]("name") -> r).toMap

    assert(out.keySet == Set("i-1", "i-2", "i-new")) // i-gone GC'd
    assert(out("i-1").getAs[String]("health_status") == "healthy")  // reset
    assert(out("i-2").getAs[String]("health_status") == "degraded") // alarm
    assert(out("i-new").getAs[String]("health_status") == "healthy")
    assert(out.values.forall(_.getAs[Long]("last_updated") == 2L))
  }

  test("topology first_seen: preserved on match, stamped on create") {
    val store = Seq(
      ("EC2", "i-1", "healthy", 1L, 100L),
      ("EC2", "i-gone", "healthy", 1L, 50L)
    ).toDF("label", "name", "health_status", "last_updated", "first_seen")
    val snapshot = Seq(("EC2", "i-1"), ("EC2", "i-new")).toDF("label", "name")
    val alarms = Seq.empty[(String, String)].toDF("label", "name")
    val out = Pipelines.topology(store, snapshot, alarms, runStamp = 2L)
      .collect().map(r => r.getAs[String]("name") ->
        r.getAs[Long]("first_seen")).toMap
    assert(out == Map("i-1" -> 100L, "i-new" -> 2L)) // preserve vs onCreate
  }

  test("topology is idempotent for a fixed snapshot+alarm set") {
    val store = Seq(("EC2", "i-1", "healthy", 1L))
      .toDF("label", "name", "health_status", "last_updated")
    val snapshot = Seq(("EC2", "i-1"), ("EC2", "i-2")).toDF("label", "name")
    val alarms = Seq(("EC2", "i-1")).toDF("label", "name")
    val once = Pipelines.topology(store, snapshot, alarms, 2L)
    val twice = Pipelines.topology(once, snapshot, alarms, 2L)
    assert(once.collect().map(_.toString).sorted.toSeq ==
      twice.collect().map(_.toString).sorted.toSeq)
  }

  test("topologyStats counters agree with the run's actual output") {
    val store = Seq(
      ("EC2", "i-1", "healthy", 1L),   // matched, alarming → degraded
      ("EC2", "i-2", "healthy", 1L),   // matched, healthy
      ("EC2", "i-gone", "healthy", 1L) // ghost → GC'd
    ).toDF("label", "name", "health_status", "last_updated")
    val snapshot = Seq(("EC2", "i-1"), ("EC2", "i-2"), ("EC2", "i-new"))
      .toDF("label", "name")
    val alarms = Seq(("EC2", "i-1")).toDF("label", "name")

    val stats = Pipelines.topologyStats(store, snapshot, alarms, 2L)
      .collect().head
    assert(stats.getAs[Long]("n_store_prior") == 3L)
    assert(stats.getAs[Long]("n_created") == 1L)   // i-new
    assert(stats.getAs[Long]("n_matched") == 2L)   // i-1, i-2
    assert(stats.getAs[Long]("n_gc") == 1L)        // i-gone
    assert(stats.getAs[Long]("n_degraded") == 1L)  // i-1
    assert(stats.getAs[Long]("n_healthy") == 2L)   // i-2, i-new
    assert(stats.getAs[Long]("n_final") == 3L)

    // the counters must be facts about the run: recount the output
    val out = Pipelines.topology(store, snapshot, alarms, 2L).collect()
    assert(stats.getAs[Long]("n_final") == out.length)
    assert(stats.getAs[Long]("n_degraded") ==
      out.count(_.getAs[String]("health_status") == "degraded"))
  }

  test("declaredDeps: refs resolved to physical ids with provenance (J13/K6)") {
    val templates = Seq(
      ("stackA", "Fn1",
        """{"Properties":{"Env":{"T":{"Ref":"Tbl"},"Q":{"Fn::GetAtt":["Que","Arn"]}}}}"""),
      ("stackA", "Fn1", """{"Unresolvable":{"Ref":"Ghost"}}""")
    ).toDF("stack_name", "src_logical", "template_json")
    val phys = Seq(("Fn1", "arn:fn1"), ("Tbl", "arn:tbl"), ("Que", "arn:que"))
      .toDF("logical_id", "physical_id")

    val out = Pipelines.declaredDeps(templates, phys).collect()
    val dsts = out.map(_.getAs[String]("dst")).toSet
    assert(dsts == Set("arn:tbl", "arn:que")) // Ghost dropped (no physical id)
    assert(out.forall(_.getAs[String]("src") == "arn:fn1"))
    assert(out.forall(_.getAs[String]("declared_in") == "cfn"))
    assert(out.forall(_.getAs[String]("edge_label") == "DependsOn"))
  }
}
