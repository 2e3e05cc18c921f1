package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  private def df(edges: Seq[(Long, Long)]): DataFrame =
    edges.toDF("u", "v")

  /** Exact ball sizes by driver-side BFS — the spec's oracle. */
  private def exactBalls(edges: Seq[(Long, Long)], r: Int): Map[Long, Int] = {
    val adj = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keySet
    nodes.map { n =>
      var ball = Set(n)
      var frontier = Set(n)
      for (_ <- 1 to r) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- ball
        ball ++= frontier
      }
      n -> ball.size
    }.toMap
  }

  test("tiny path: small-range corrected estimates are exact") {
    // 1-2-3 path: balls at r=1 are {1:2, 2:3, 3:2} — with m=128 registers
    // and ≤3 members the ln-corrected estimate rounds to the true count
    val out = HyperBall.estimateBalls(df(Seq((1L, 2L), (2L, 3L))),
        "u", "v", radius = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 3L, 3L -> 2L))
  }

  test("radius growth: registers only accumulate, sums never shrink") {
    val edges = (0L until 100L).map(i => (i, (i * 7 + 3) % 100))
    val nf = HyperBall.neighborhood(df(edges), "u", "v", maxRadius = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(nf(1) <= nf(2) && nf(2) <= nf(3))
  }

  test("aggregate estimate within 15% of exact on a deterministic graph") {
    val edges = (0L until 200L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 200), (i, (i * 13 + 5) % 200)))
    val exact2 = exactBalls(edges, 2).values.map(_.toLong).sum
    val est2 = HyperBall.neighborhood(df(edges), "u", "v", maxRadius = 2)
      .collect().find(_.getInt(0) == 2).get.getLong(1)
    assert(math.abs(est2 - exact2) <= exact2 * 0.15,
      s"est $est2 vs exact $exact2")
  }

  test("deterministic: two runs produce identical estimates") {
    val edges = (0L until 60L).map(i => (i, (i * 11 + 1) % 60))
    def run() = HyperBall.estimateBalls(df(edges), "u", "v", radius = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(run() === run())
  }

  test("pair list direction does not matter (symmetrized internally)") {
    val a = HyperBall.estimateBalls(df(Seq((1L, 2L), (2L, 3L), (3L, 4L))),
      "u", "v", radius = 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = HyperBall.estimateBalls(df(Seq((2L, 1L), (3L, 2L), (4L, 3L))),
      "u", "v", radius = 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
