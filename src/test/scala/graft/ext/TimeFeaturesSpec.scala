package graft.ext

import java.sql.Timestamp

import graft.SparkSpec

class TimeFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (1L, 10L, ts("2024-01-01 00:00:00"), 10.0),
    (1L, 11L, ts("2024-01-01 00:01:00"), 30.0),
    (1L, 12L, ts("2024-01-01 00:03:00"), 20.0),
    (2L, 20L, ts("2024-01-01 00:00:30"), 5.0)
  ).toDF("user_id", "event_id", "ts", "value")

  test("lag, delta and rolling stats over a 2-row trailing frame") {
    val out = TimeFeatures.derive(rows, Seq("user_id"), "ts", "value",
      tieCol = "event_id", frameRows = 1)
      .as[(Long, Long, Timestamp, Double, Option[Double], Option[Long], Double, Double)]
      .collect().map(r => r._2 -> (r._5, r._6, r._7, r._8)).toMap
    // first event of each user: no prev, frame = itself
    assert(out(10L) == ((None, None, 10.0, 10.0)))
    assert(out(20L) == ((None, None, 5.0, 5.0)))
    // second: prev 10, 60 s later, frame {10, 30} → mean 20, max 30
    assert(out(11L) == ((Some(10.0), Some(60L), 20.0, 30.0)))
    // third: prev 30, 120 s later, frame {30, 20} → mean 25, max 30
    assert(out(12L) == ((Some(30.0), Some(120L), 25.0, 30.0)))
  }

  test("equal timestamps order deterministically by the tie column") {
    val tied = Seq(
      (1L, 2L, ts("2024-01-01 00:00:00"), 7.0),
      (1L, 1L, ts("2024-01-01 00:00:00"), 3.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = TimeFeatures.derive(tied, Seq("user_id"), "ts", "value",
      tieCol = "event_id", frameRows = 1)
      .as[(Long, Long, Timestamp, Double, Option[Double], Option[Long], Double, Double)]
      .collect().map(r => r._2 -> r._5).toMap
    assert(out(1L).isEmpty)        // event 1 sorts first
    assert(out(2L) == Some(3.0))   // event 2 sees event 1 as prev
  }
}
