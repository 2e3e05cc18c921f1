package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourly grid carries the last observation at or before each point") {
    val obs = Seq(
      (1L, 10L, ts("2024-01-01 00:30:00"), 5.0),
      (1L, 11L, ts("2024-01-01 02:00:00"), 7.0), // exactly ON a grid point
      (1L, 12L, ts("2024-01-01 03:40:00"), 9.0),
      (2L, 20L, ts("2024-01-01 05:15:00"), 1.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Resample.forwardFill(obs, Seq("user_id"), "ts", "value",
      tieCol = "event_id")
      .as[(Long, Timestamp, Option[Double])].collect()
      .map(r => (r._1, r._2.toString) -> r._3).toMap
    // user 1 grid: 00:00 (before first obs → null), 01:00, 02:00, 03:00
    assert(out((1L, "2024-01-01 00:00:00.0")).isEmpty)
    assert(out((1L, "2024-01-01 01:00:00.0")) == Some(5.0))
    assert(out((1L, "2024-01-01 02:00:00.0")) == Some(7.0)) // boundary obs seen
    assert(out((1L, "2024-01-01 03:00:00.0")) == Some(7.0))
    // user 2: single-hour range → one grid point, before-obs → null
    assert(out((2L, "2024-01-01 05:00:00.0")).isEmpty)
    assert(out.size == 5)
  }

  test("null-timestamp observations are dropped, not carried into the grid") {
    val obs = Seq(
      (1L, 1L, Option.empty[Timestamp], 99.0),
      (1L, 2L, Some(ts("2024-01-01 01:30:00")), 5.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Resample.forwardFill(obs, Seq("user_id"), "ts", "value",
      tieCol = "event_id")
      .as[(Long, Timestamp, Option[Double])].collect()
    // single grid point 01:00, BEFORE the only positioned obs → null,
    // never the null-ts row's 99.0
    assert(out.toSeq == Seq((1L, ts("2024-01-01 01:00:00"), None)))
  }

  test("ties on one timestamp resolve by the tie column (last wins)") {
    val obs = Seq(
      (1L, 2L, ts("2024-01-01 00:10:00"), 8.0),
      (1L, 1L, ts("2024-01-01 00:10:00"), 3.0),
      (1L, 3L, ts("2024-01-01 01:30:00"), 0.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Resample.forwardFill(obs, Seq("user_id"), "ts", "value",
      tieCol = "event_id")
      .as[(Long, Timestamp, Option[Double])].collect()
      .map(r => r._2.toString -> r._3).toMap
    // event 2 (id-larger) is the LAST at 00:10 → its value carries
    assert(out("2024-01-01 01:00:00.0") == Some(8.0))
  }
}
