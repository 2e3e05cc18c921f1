package graft.ext

import graft.SparkSpec

class SsspSpec extends SparkSpec {
  import spark.implicits._

  private def run(e: Seq[(Long, Long, Long)], s: Seq[Long], rounds: Int,
      undirected: Boolean = false, bcast: Boolean = false): Map[Long, Long] =
    Sssp.boundedCosts(e.toDF("s", "d", "w"), "s", "d", "w",
        s.toDF("id"), "id", rounds, undirected, bcast)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cheaper long path beats expensive short path within the bound") {
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5
    val e = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
    assert(run(e, Seq(1L), 2) === Map(1L -> 0, 2L -> 2, 3L -> 5))
    // with only 1 round, the direct edge is the best ≤1-edge path
    assert(run(e, Seq(1L), 1) === Map(1L -> 0, 2L -> 2, 3L -> 10))
  }

  test("parallel edges collapse to the cheapest") {
    val e = Seq((1L, 2L, 7L), (1L, 2L, 4L))
    assert(run(e, Seq(1L), 1) === Map(1L -> 0, 2L -> 4))
  }

  test("direction is honored unless undirected is requested") {
    val e = Seq((2L, 1L, 5L))
    assert(run(e, Seq(1L), 2) === Map(1L -> 0))
    assert(run(e, Seq(1L), 2, undirected = true) === Map(1L -> 0, 2L -> 5))
  }

  test("multi-seed takes the global minimum") {
    val e = Seq((1L, 2L, 10L), (3L, 2L, 1L))
    assert(run(e, Seq(1L, 3L), 1) === Map(1L -> 0, 3L -> 0, 2L -> 1))
  }

  test("zero-weight edges and revisits cannot loop the cost below zero") {
    val e = Seq((1L, 2L, 0L), (2L, 1L, 0L))
    assert(run(e, Seq(1L), 5) === Map(1L -> 0, 2L -> 0))
  }

  test("broadcast-costs mode matches the shuffle path") {
    val e = Seq((1L, 2L, 2L), (2L, 3L, 2L), (1L, 3L, 9L), (3L, 4L, 1L))
    assert(run(e, Seq(1L), 3, bcast = true) === run(e, Seq(1L), 3))
  }
}
