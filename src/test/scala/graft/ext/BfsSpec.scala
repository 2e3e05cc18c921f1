package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("u", "v")
  private def seeds(ids: Long*) = ids.toDF("id")

  private def run(e: Seq[(Long, Long)], s: Seq[Long], depth: Int,
      bcast: Boolean = true): Map[Long, Int] =
    Bfs.distances(edges(e: _*), "u", "v", seeds(s: _*), "id", depth,
        broadcastFrontier = bcast)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("chain distances from a single seed, depth-bounded") {
    // 1-2-3-4-5-6: depth 3 from node 1 reaches 4, not 5/6
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(run(e, Seq(1L), 3) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("multi-source takes the minimum distance over all seeds") {
    // chain 1..6 seeded at both ends: middle nodes settle at min hop
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(run(e, Seq(1L, 6L), 5) ===
      Map(1L -> 0, 6L -> 0, 2L -> 1, 5L -> 1, 3L -> 2, 4L -> 2))
  }

  test("edges are undirected regardless of stored orientation") {
    val e = Seq((2L, 1L), (2L, 3L)) // both stored away from/towards 2
    assert(run(e, Seq(1L), 2) === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("a node reachable along many paths is emitted exactly once") {
    // diamond + triangle multiplicities: 1-{2,3}-4, plus 2-3
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (2L, 3L))
    val out = Bfs.distances(edges(e: _*), "u", "v", seeds(1L), "id", 4)
    assert(out.groupBy("node").count().filter($"count" > 1).isEmpty)
    assert(run(e, Seq(1L), 4) === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("disconnected nodes are absent; off-graph seeds settle at 0") {
    val e = Seq((1L, 2L), (10L, 11L))
    assert(run(e, Seq(1L, 99L), 3) === Map(1L -> 0, 99L -> 0, 2L -> 1))
  }

  test("early exit past exhaustion leaves the answer unchanged") {
    val e = Seq((1L, 2L), (2L, 3L))
    assert(run(e, Seq(1L), 10) === run(e, Seq(1L), 2))
  }

  test("shuffle-join path (broadcastFrontier=false) matches broadcast") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (5L, 6L))
    assert(run(e, Seq(1L), 3, bcast = false) === run(e, Seq(1L), 3))
  }
}
