package graft.ext

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("u", "v"), "u", "v")
      .as[(Long, Long)].collect().toMap

  test("two disjoint triangles, with noise edges, dupes and self-loops") {
    val out = count(Seq(
      1L -> 2L, 2L -> 3L, 3L -> 1L, // triangle
      2L -> 1L, 1L -> 2L,           // duplicates in both directions
      3L -> 4L,                     // bridge, no triangle
      4L -> 5L, 5L -> 6L, 4L -> 6L, // triangle
      5L -> 5L                      // self-loop
    ))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("K4: every node sits in C(3,2)=3 triangles") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield i -> j
    assert(count(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("matches brute-force enumeration on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val n = 30
    val edges = (for (i <- 1L to n; j <- (i + 1) to n if rnd.nextDouble() < 0.2)
      yield i -> j).toSeq
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupMap(_._1)(_._2)
      .map { case (k, vs) => k -> vs.toSet }
    val brute = (for {
      a <- 1L to n; b <- (a + 1) to n if adj.getOrElse(a, Set.empty)(b)
      c <- (b + 1) to n
      if adj.getOrElse(a, Set.empty)(c) && adj.getOrElse(b, Set.empty)(c)
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    assert(count(edges) == brute)
  }

  test("triangle-free graph returns no rows") {
    assert(count(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)).isEmpty)
  }

  test("shuffle fallback (broadcastAdjacency=false) matches broadcast path") {
    // the >10^8-edge path: degree hints and the oriented adjacency join
    // by shuffle instead of broadcast — must be result-identical
    val rnd = new scala.util.Random(7)
    val edges = (for (i <- 1L to 25L; j <- (i + 1) to 25L
      if rnd.nextDouble() < 0.25) yield i -> j).toSeq.toDF("u", "v")
    val viaBroadcast = Triangles.perNode(edges, "u", "v")
      .as[(Long, Long)].collect().toMap
    val viaShuffle = Triangles.perNode(edges, "u", "v",
      broadcastAdjacency = false).as[(Long, Long)].collect().toMap
    assert(viaShuffle == viaBroadcast)
  }
}
