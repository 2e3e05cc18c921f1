package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FlowRollupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val flows = Seq(
    // (src, dst, value, ts) — 3 calls a->x (one err), 1 call a->y (filtered
    // by minCalls), 2 calls b->x, one stale row outside the window
    ("a", "x", 10.0, ts("2024-01-02 00:00:00")),
    ("a", "x", 20.0, ts("2024-01-02 00:01:00")),
    ("a", "x", 90.0, ts("2024-01-02 00:02:00")),
    ("a", "y", 5.0,  ts("2024-01-02 00:00:00")),
    ("b", "x", 1.0,  ts("2024-01-02 00:00:00")),
    ("b", "x", 2.0,  ts("2024-01-02 00:00:30")),
    ("z", "x", 99.0, ts("2023-12-01 00:00:00"))
  ).toDF("src", "dst", "value", "ts")

  test("window filter + HAVING + err count + top-k (etl_deepflow:633-646)") {
    val out = FlowRollup(flows, "src", "dst", "value",
      timePredicate = $"ts" >= lit("2024-01-01 00:00:00").cast("timestamp"),
      errPredicate = $"value" >= 50.0,
      minCalls = 2, topK = 10)
    val rows = out.collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.keySet == Set(("a", "x"), ("b", "x"))) // y: 1 call; z: stale
    assert(rows(("a", "x")).getAs[Long]("calls") == 3)
    assert(rows(("a", "x")).getAs[Double]("avg_value") == 40.0)
    assert(rows(("a", "x")).getAs[Long]("err_count") == 1)
    assert(rows(("b", "x")).getAs[Long]("err_count") == 0)
  }

  test("topK truncates by calls desc with deterministic tiebreak") {
    val out = FlowRollup(flows, "src", "dst", "value",
      timePredicate = lit(true), errPredicate = lit(false),
      minCalls = 1, topK = 2)
    assert(out.select("src", "dst").as[(String, String)].collect().toSeq ==
      Seq(("a", "x"), ("b", "x"))) // 3 calls, then 2; (a,y)/(z,x) cut
  }
}
