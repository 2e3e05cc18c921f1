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

  test("effective diameter: a path graph saturates at its true diameter") {
    // path 0-1-...-9: diameter 9; at fraction=1.0 the ball sum keeps
    // growing until radius 9 and is flat after — the pick must be 9
    val path = (0L until 9L).map(i => (i, i + 1))
    val out = HyperBall.effectiveDiameter(df(path), "u", "v",
      maxRadius = 12, fraction = 1.0).collect().head
    assert(out.getInt(0) === 9)
    assert(out.getLong(1) === out.getLong(2)) // nf_at == nf_max there
  }

  test("partition invariance: estimates ignore input layout") {
    val edges = (0L until 150L).map(i => (i, (i * 7 + 3) % 150))
    def run(parts: Int) =
      HyperBall.estimateBalls(df(edges).repartition(parts), "u", "v",
        radius = 2).collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq
    assert(run(1) === run(13))
  }

  test("degenerate graphs: empty and self-loop-only inputs don't crash") {
    // review r11: the per-radius sum over an empty register frame is
    // NULL — must coalesce to 0, not NPE in the driver pick
    for (edges <- Seq(Seq.empty[(Long, Long)], Seq((3L, 3L), (7L, 7L)))) {
      val out = HyperBall.effectiveDiameter(df(edges), "u", "v",
        maxRadius = 2).collect().head
      assert(out.getLong(2) === 0L, s"edges=$edges")
      val nf = HyperBall.neighborhood(df(edges), "u", "v", maxRadius = 2)
        .collect().map(_.getLong(1))
      assert(nf.forall(_ === 0L))
    }
  }

  test("harmonic centrality: exact on a small path, center beats ends") {
    // path 1-2-3-4-5: tiny balls → small-range estimates are exact, so
    // harmonic_micro equals the exact Σ (new nodes at r)/r in µ-units
    val out = HyperBall.harmonicCentrality(
        df(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))),
        "u", "v", maxRadius = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = exactBalls(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), 0)
    def h(ballSizes: Seq[Int]): Long = {
      val deltas = ballSizes.zip(1 +: ballSizes).map { case (b, prev) =>
        math.max(b - prev, 0) }
      math.floor(deltas.zipWithIndex
        .map { case (d, i) => d.toDouble / (i + 1) }.sum * 1e6 + 0.5).toLong
    }
    for (n <- 1L to 5L) {
      val balls = (1 to 4).map(r =>
        exactBallsFor(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), n, r))
      assert(out(n) === h(balls), s"node $n")
    }
    assert(out(3L) > out(1L) && out(3L) > out(5L)) // center most central
    assert(exact.nonEmpty) // (silence the unused warning honestly)
  }

  private def exactBallsFor(edges: Seq[(Long, Long)], node: Long,
      r: Int): Int = exactBalls(edges, r)(node)

  test("pair list direction does not matter (symmetrized internally)") {
    val a = HyperBall.estimateBalls(df(Seq((1L, 2L), (2L, 3L), (3L, 4L))),
      "u", "v", radius = 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = HyperBall.estimateBalls(df(Seq((2L, 1L), (3L, 2L), (4L, 3L))),
      "u", "v", radius = 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
