package graft.ops

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping and touching intervals merge; gaps split islands") {
    val iv = Seq(
      ("k1", 0L, 10L),   // island 1
      ("k1", 5L, 15L),   // overlaps
      ("k1", 15L, 20L),  // touches (end == start): merges
      ("k1", 25L, 30L),  // gap: island 2
      ("k2", 0L, 1L)     // other key untouched
    ).toDF("k", "s", "e")
    val out = Intervals.mergeOverlapping(iv, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("k1", 0L, 20L, 3L), ("k1", 25L, 30L, 1L),
      ("k2", 0L, 1L, 1L)))
  }

  test("an interval nested inside an earlier one never splits the island") {
    // running-max matters: (0,100) then (10,20) then (30,40) — a naive
    // lag(end) comparison would wrongly open an island at 30
    val iv = Seq(("k", 0L, 100L), ("k", 10L, 20L), ("k", 30L, 40L))
      .toDF("k", "s", "e")
    val out = Intervals.mergeOverlapping(iv, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("k", 0L, 100L, 3L)))
  }

  test("single interval and empty input pass through") {
    val one = Seq(("k", 1L, 2L)).toDF("k", "s", "e")
    assert(Intervals.mergeOverlapping(one, Seq("k"), "s", "e").count() == 1)
    val empty = Seq.empty[(String, Long, Long)].toDF("k", "s", "e")
    assert(Intervals.mergeOverlapping(empty, Seq("k"), "s", "e").count() == 0)
  }

  test("gaps are the exact complement of the merged islands") {
    val iv = Seq(
      ("k1", 0L, 10L), ("k1", 5L, 15L), ("k1", 15L, 20L),
      ("k1", 25L, 30L), ("k1", 50L, 60L),
      ("k2", 0L, 1L) // single island → no gap
    ).toDF("k", "s", "e")
    val out = Intervals.gaps(iv, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("k1", 20L, 25L, 5L), ("k1", 30L, 50L, 20L)))
  }

  test("nested intervals never open a phantom gap (running max, not lag)") {
    val iv = Seq(("k", 0L, 100L), ("k", 10L, 20L), ("k", 150L, 160L))
      .toDF("k", "s", "e")
    val out = Intervals.gaps(iv, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("k", 100L, 150L, 50L)))
  }
}
