package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class CohortSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retention triangle: cohort size at offset 0, returners after") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort Jan 1
      (1L, ts("2024-01-02 11:00:00")), // returns day 1
      (1L, ts("2024-01-02 12:00:00")), // same day — counts once
      (2L, ts("2024-01-01 09:00:00")), // cohort Jan 1, never returns
      (3L, ts("2024-01-02 09:00:00")), // cohort Jan 2
      (3L, ts("2024-01-04 09:00:00"))  // returns day 2
    ).toDF("user_id", "ts")
    val out = Cohort.retention(ev, "user_id", "ts")
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => (r._1.toString, r._2) -> r._3).toMap
    assert(out(("2024-01-01", 0L)) == 2L) // users 1, 2
    assert(out(("2024-01-01", 1L)) == 1L) // user 1 returned
    assert(out(("2024-01-02", 0L)) == 1L) // user 3
    assert(out(("2024-01-02", 2L)) == 1L) // user 3 on Jan 4
    assert(out.size == 4)
  }
}
