package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("collapses runs, opens/closes validity, flags current") {
    val obs = Seq(
      ("r1", ts("2024-01-01 00:00:00"), 1L, "healthy"),
      ("r1", ts("2024-01-02 00:00:00"), 2L, "healthy"),  // no change: collapses
      ("r1", ts("2024-01-03 00:00:00"), 3L, "degraded"), // change
      ("r1", ts("2024-01-04 00:00:00"), 4L, "healthy"),  // change back
      ("r2", ts("2024-01-01 00:00:00"), 5L, "healthy")
    ).toDF("name", "ts", "obs_id", "status")
    val out = Scd2.history(obs, Seq("name"), "ts", Seq("status"),
        tieBreak = Seq("obs_id"))
      .collect().map(r => (r.getAs[String]("name"),
        r.getAs[Timestamp]("valid_from").toString.take(10),
        Option(r.getAs[Timestamp]("valid_to")).map(_.toString.take(10)),
        r.getAs[String]("status"), r.getAs[Boolean]("is_current"))).toSet
    assert(out == Set(
      ("r1", "2024-01-01", Some("2024-01-03"), "healthy", false),
      ("r1", "2024-01-03", Some("2024-01-04"), "degraded", false),
      ("r1", "2024-01-04", None, "healthy", true),
      ("r2", "2024-01-01", None, "healthy", true)))
  }

  test("null-safe change detection: null <-> value transitions are changes") {
    val obs = Seq(
      ("r1", 1L, 10L, Option("a")),
      ("r1", 2L, 11L, None),        // a -> null: change
      ("r1", 3L, 12L, None),        // null run: collapses
      ("r1", 4L, 13L, Option("a"))  // null -> a: change
    ).toDF("name", "ts", "obs_id", "v")
    val out = Scd2.history(obs, Seq("name"), "ts", Seq("v"), Seq("obs_id"))
    assert(out.count() == 3)
  }

  test("plans a single exchange: both windows share partitioning+order") {
    val obs = Seq(("r1", 1L, 1L, "x")).toDF("name", "ts", "obs_id", "v")
    val q = Scd2.history(obs, Seq("name"), "ts", Seq("v"), Seq("obs_id"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n${plan.take(600)}")
  }
}
