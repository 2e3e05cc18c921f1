package graft.ext

import graft.SparkSpec

class IncrementalCcSpec extends SparkSpec {
  import spark.implicits._

  private def cc(e: Seq[(Long, Long)]) =
    Components.connectedAdaptive(e.toDF("a", "b"), "a", "b")

  private def incr(labels: Seq[(Long, Long)], batch: Seq[(Long, Long)])
      : Map[Long, Long] =
    Components.incrementalUpdate(labels.toDF("node", "component"),
        batch.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one new edge merges two standing components to the global min") {
    val labels = Seq(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L)
    assert(incr(labels, Seq(2L -> 6L)) ===
      Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("new nodes form their own component; attachments join the old one") {
    val labels = Seq(1L -> 1L, 2L -> 1L)
    assert(incr(labels, Seq(10L -> 11L, 3L -> 2L)) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("an intra-component batch edge changes nothing") {
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L)
    assert(incr(labels, Seq(2L -> 3L)) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a new node with a SMALLER id than the old minimum relabels it") {
    val labels = Seq(5L -> 5L, 6L -> 5L)
    assert(incr(labels, Seq(1L -> 6L)) === Map(1L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("chained batch merges collapse transitively in one update") {
    // three standing singleton components bridged A-B and B-C in the
    // same batch: everything lands on the global min
    val labels = Seq(10L -> 10L, 20L -> 20L, 30L -> 30L)
    assert(incr(labels, Seq(10L -> 20L, 20L -> 30L)) ===
      Map(10L -> 10L, 20L -> 10L, 30L -> 10L))
  }

  test("incremental ≡ from-scratch recompute on a split edge stream") {
    val all = (1L to 60L).map(i => i -> (i * 7 % 60 + 1))
      .filter { case (a, b) => a != b }
    val (old, batch) = all.partition { case (a, b) => (a + b) % 3 != 0 }
    val viaIncr = Components.incrementalUpdate(cc(old),
        batch.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = cc(all).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical support: old ∪ batch endpoints = all endpoints
    assert(viaIncr === scratch)
  }
}
