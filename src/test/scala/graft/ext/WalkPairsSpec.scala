package graft.ext

import graft.SparkSpec

class WalkPairsSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(walks: Seq[(Long, Int, Long)], window: Int) =
    Walks.skipGramPairs(walks.toDF("walk_id", "step", "node"), window)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("window-1 pairs of a single path are its ordered adjacencies") {
    val w = Seq((1L, 0, 10L), (1L, 1, 11L), (1L, 2, 12L))
    assert(pairs(w, 1) === Map((10L, 11L) -> 1L, (11L, 10L) -> 1L,
      (11L, 12L) -> 1L, (12L, 11L) -> 1L))
  }

  test("window-2 adds the skip pairs; multiplicity accumulates") {
    val w = Seq((1L, 0, 10L), (1L, 1, 11L), (1L, 2, 10L))
    // path 10-11-10: (10,11) twice (from both 10s), (10,10) via skip-2
    val p = pairs(w, 2)
    assert(p((10L, 11L)) === 2L && p((11L, 10L)) === 2L)
    assert(p((10L, 10L)) === 2L) // both orders of the step-0/step-2 pair
  }

  test("pairs never cross walks") {
    val w = Seq((1L, 0, 10L), (1L, 1, 11L), (2L, 0, 20L), (2L, 1, 21L))
    val p = pairs(w, 3)
    assert(!p.contains((10L, 20L)) && !p.contains((11L, 21L)))
    assert(p((10L, 11L)) === 1L && p((20L, 21L)) === 1L)
  }

  test("matches a brute-force window scan") {
    val walks = for (wk <- 1L to 5L; s <- 0 to 6)
      yield (wk, s, (wk * 7 + s * 3) % 11)
    val brute = walks.groupBy(_._1).values.flatMap { w =>
      val path = w.sortBy(_._2).map(_._3)
      for (i <- path.indices; j <- path.indices
           if i != j && math.abs(i - j) <= 2)
        yield (path(i), path(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(pairs(walks, 2) === brute)
  }
}
