package graft.ext

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  // two triangles {1,2,3} and {10,11,12} joined by a single bridge 3–10
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),
    (10L, 11L), (11L, 12L), (10L, 12L),
    (3L, 10L)
  ).toDF("src", "dst")

  private def labelsAfter(r: Int): Map[Long, Long] =
    LabelProp.propagate(edges, "src", "dst", rounds = r)
      .as[(Long, Long)].collect().toMap

  test("round 1: every node adopts its smallest neighbor label") {
    val l = labelsAfter(1)
    // node 1's neighbors {2,3} → 2; node 2's {1,3} → 1; node 3's {1,2,10} → 1
    assert(l(1L) == 2L && l(2L) == 1L && l(3L) == 1L)
    // triangle 2: node 10's neighbors {3,11,12} → 3
    assert(l(10L) == 3L && l(11L) == 10L && l(12L) == 10L)
  }

  test("ties break to the smallest label, majority wins otherwise") {
    val l2 = labelsAfter(2)
    // round 2, node 11: neighbors {10→3, 12→10} tie 1-1 → min label 3
    assert(l2(11L) == 3L)
    // round 2, node 2: neighbors {1→2, 3→1} tie → 1
    assert(l2(2L) == 1L)
  }

  test("self-loops are ignored and direction does not matter") {
    val withLoop = edges.union(Seq((5L, 5L)).toDF("src", "dst"))
    val l = LabelProp.propagate(withLoop, "src", "dst", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(!l.contains(5L)) // isolated self-loop node drops out
    assert(l == labelsAfter(1))
  }
}
