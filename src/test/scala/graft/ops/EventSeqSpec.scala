package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class EventSeqSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def run(rows: Seq[(Long, Long, Long, String)], steps: Seq[String],
      gapSec: Long) =
    EventSeq.matchContiguous(
        rows.map { case (u, t, id, ty) => (u, ts(t), id, ty) }
          .toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type", steps,
        gapSec * 1000000L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getTimestamp(2).getTime / 1000)).toSet

  test("finds the contiguous chain and honors the gap bound") {
    val rows = Seq(
      (1L, 100L, 1L, "a"), (1L, 110L, 2L, "b"), (1L, 115L, 3L, "c"),
      (2L, 100L, 4L, "a"), (2L, 500L, 5L, "b"), (2L, 505L, 6L, "c"))
    // user 2's a->b gap (400 s) exceeds the 60 s bound
    assert(run(rows, Seq("a", "b", "c"), 60) === Set((1L, 100L, 115L)))
    assert(run(rows, Seq("a", "b", "c"), 1000) ===
      Set((1L, 100L, 115L), (2L, 100L, 505L)))
  }

  test("contiguity: an interrupting event breaks the match") {
    val rows = Seq(
      (1L, 100L, 1L, "a"), (1L, 101L, 2L, "x"), (1L, 102L, 3L, "b"))
    assert(run(rows, Seq("a", "b"), 1000).isEmpty)
  }

  test("overlapping matches all emit") {
    val rows = Seq((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"),
      (1L, 3L, 3L, "a"), (1L, 4L, 4L, "b"), (1L, 5L, 5L, "a"))
    assert(run(rows, Seq("a", "b"), 10) ===
      Set((1L, 1L, 2L), (1L, 3L, 4L)))
  }

  test("equal timestamps order by the tie column — match set is stable") {
    val rows = Seq((1L, 100L, 2L, "b"), (1L, 100L, 1L, "a"))
    // tie broken by event_id: a (id 1) precedes b (id 2)
    assert(run(rows, Seq("a", "b"), 10) === Set((1L, 100L, 100L)))
  }
}
