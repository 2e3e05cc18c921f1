package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("per-entity ordered transitions aggregate into exact probabilities") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "view"),
      (1L, 11L, ts("2024-01-01 00:01:00"), "click"),
      (1L, 12L, ts("2024-01-01 00:02:00"), "view"),
      (2L, 20L, ts("2024-01-01 00:00:00"), "view"),
      (2L, 21L, ts("2024-01-01 00:01:00"), "click"),
      (3L, 30L, ts("2024-01-01 00:00:00"), "view") // single event: no row
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Transitions.matrix(ev, "user_id", "event_type", "ts", "event_id")
      .as[(String, String, Long, Double)]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // from view: 2× to click; from click: 1× to view
    assert(out(("view", "click")) == ((2L, 1.0)))
    assert(out(("click", "view")) == ((1L, 1.0)))
    assert(out.size == 2)
  }

  test("equal timestamps order by the tie column") {
    val ev = Seq(
      (1L, 2L, ts("2024-01-01 00:00:00"), "b"),
      (1L, 1L, ts("2024-01-01 00:00:00"), "a")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Transitions.matrix(ev, "user_id", "event_type", "ts", "event_id")
      .as[(String, String, Long, Double)].collect()
    assert(out.toSeq == Seq(("a", "b", 1L, 1.0))) // a (id 1) precedes b
  }
}
