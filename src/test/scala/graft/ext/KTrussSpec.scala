package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class KTrussSpec extends SparkSpec {
  import spark.implicits._

  private def df(edges: Seq[(Long, Long)]): DataFrame = edges.toDF("u", "v")

  /** Driver-side reference: simultaneous peeling, exact. */
  private def reference(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Set[(Long, Long)] = {
    var e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    for (_ <- 1 to rounds) {
      // support(a,b) = |common neighbors| on the CURRENT survivor set
      val adj = (e.toSeq ++ e.toSeq.map(_.swap))
        .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2).toSet }
      e = e.filter { case (a, b) => (adj(a) & adj(b)).size >= k - 2 }
    }
    e
  }

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    KTruss.survivors(df(edges), "u", "v", k, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("a 4-clique is a 4-truss; its pendant edge is not") {
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val edges = clique :+ (4L -> 9L) // pendant
    assert(run(edges, k = 4, rounds = 2) === clique.toSet)
  }

  test("a bare triangle survives k=3 but dies at k=4") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(run(tri, k = 3, rounds = 2) === tri.toSet)
    assert(run(tri, k = 4, rounds = 2) === Set.empty)
  }

  test("simultaneous peeling matches the reference across rounds") {
    // two 4-cliques sharing one edge plus a bridge chain — peeling
    // round 2 must re-evaluate support on round 1's survivor set
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L), (5L, 7L), (6L, 7L), (4L, 7L),
      (7L, 8L), (8L, 9L))
    for (k <- 3 to 5; r <- 1 to 3) {
      assert(run(edges, k, r) === reference(edges, k, r),
        s"k=$k rounds=$r")
    }
  }

  test("broadcast and shuffle adjacency paths agree") {
    val edges = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 60), (i, (i * 11 + 5) % 60)))
    val a = KTruss.survivors(df(edges), "u", "v", k = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = KTruss.survivors(df(edges), "u", "v", k = 3, rounds = 2,
        broadcastAdjacency = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("direction and duplicates in the input do not matter") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val messy = tri ++ tri.map(_.swap) ++ tri
    assert(run(messy, k = 3, rounds = 1) === tri.toSet)
  }
}
