package graft.ops

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private def left = Seq(
    (1L, "k1", d("2024-01-10")),
    (2L, "k1", d("2024-01-15")), // equal to a right time → matches it (>=)
    (3L, "k1", d("2024-01-20")),
    (4L, "k2", d("2024-01-10")), // k2 has no right rows at all
    (5L, "k1", d("2024-01-01"))  // before every right row → nulls
  ).toDF("event_id", "k", "t")

  private def right = Seq(
    ("k1", d("2024-01-05"), 10.0),
    ("k1", d("2024-01-15"), 20.0),
    ("k3", d("2024-01-01"), 99.0) // key never on the left
  ).toDF("k", "rt", "metric")

  test("latest right row at-or-before each left time, per key") {
    val out = AsOfJoin(left, right, Seq("k"), "t", "rt")
      .select("event_id", "rt", "metric")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.toString), Option(r.get(2)))).toMap
    assert(out(1L) == (Some("2024-01-05"), Some(10.0)))
    assert(out(2L) == (Some("2024-01-15"), Some(20.0))) // >= includes ties
    assert(out(3L) == (Some("2024-01-15"), Some(20.0)))
    assert(out(4L) == (None, None)) // left-outer: key without history
    assert(out(5L) == (None, None)) // left-outer: before all history
  }

  test("left row count is preserved exactly (no fan-out, no drops)") {
    val out = AsOfJoin(left, right, Seq("k"), "t", "rt")
    assert(out.count() == left.count())
    assert(out.columns.toSeq ==
      Seq("k", "t", "event_id", "rt", "metric"))
  }

  test("a NULL right payload is carried as part of its row, not skipped") {
    // k1@01-15 has metric NULL: rows at-or-after it must see (01-15, null),
    // NOT the newer __rt paired with the older row's metric. Per-column
    // carry-forward (the pre-struct implementation) mixed right rows here.
    val rightNullable = Seq(
      ("k1", d("2024-01-05"), Option(10.0)),
      ("k1", d("2024-01-15"), None)
    ).toDF("k", "rt", "metric")
    val out = AsOfJoin(left, rightNullable, Seq("k"), "t", "rt")
      .select("event_id", "rt", "metric")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.toString), Option(r.get(2)))).toMap
    assert(out(1L) == (Some("2024-01-05"), Some(10.0)))
    assert(out(2L) == (Some("2024-01-15"), None)) // whole latest row, null and all
    assert(out(3L) == (Some("2024-01-15"), None))
    assert(out(5L) == (None, None))
  }

  test("tolerance bound nulls out matches older than the staleness limit") {
    // date - date yields a day-interval in Spark; bound staleness to 3 days
    val out = AsOfJoin(left, right, Seq("k"), "t", "rt",
        tolerance = Some(expr("interval 3 days")))
      .select("event_id", "rt", "metric")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.toString), Option(r.get(2)))).toMap
    assert(out(1L) == (None, None)) // 5 days stale: nulled by the bound
    assert(out(2L) == (Some("2024-01-15"), Some(20.0))) // 0 days old: keep
    assert(out(3L) == (None, None)) // 5 days stale: nulled
    assert(out(4L) == (None, None))
    assert(out(5L) == (None, None)) // no match at all
  }

  test("plans as one shuffle + window — no join operator at all") {
    val q = AsOfJoin(left, right, Seq("k"), "t", "rt")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"), plan.take(300))
    assert(plan.contains("Window"))
  }
}
