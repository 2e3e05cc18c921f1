package graft.ext

import graft.SparkSpec

class WeightedPageRankSpec extends SparkSpec {
  import spark.implicits._

  test("all-equal weights reproduce uniform PageRank bit-for-bit") {
    val edges = (0L until 40L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 40), (i, (i * 11 + 5) % 40)))
    val uni = PageRank.scores(edges.toDF("s", "d"), "s", "d",
        iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val w = PageRank.weightedScores(
        edges.map { case (a, b) => (a, b, 5L) }.toDF("s", "d", "w"),
        "s", "d", "w", iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(w === uni)
  }

  test("weight concentration steers the score flow") {
    // hub 0 points at 1 (weight 9) and 2 (weight 1): node 1 must end
    // far above node 2, which uniform PageRank would score equally
    val df = Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
      .toDF("s", "d", "w")
    val m = PageRank.weightedScores(df, "s", "d", "w", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) > 3 * m(2L), s"weights did not steer: $m")
  }

  test("parallel edges collapse by weight sum; w<=0 edges drop") {
    val a = PageRank.weightedScores(
      Seq((0L, 1L, 3L), (0L, 1L, 4L), (1L, 0L, 2L), (0L, 2L, 0L),
        (0L, 2L, -5L))
        .toDF("s", "d", "w"), "s", "d", "w", iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = PageRank.weightedScores(
      Seq((0L, 1L, 7L), (1L, 0L, 2L)).toDF("s", "d", "w"),
      "s", "d", "w", iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("driver-side exact replay of the integer recurrence") {
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L),
      (3L, 1L, 4L))
    val scale = PageRank.Scale
    val nodes = Seq(1L, 2L, 3L)
    val wd = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = (BigInt(scale) * 15L / (BigInt(100L) * nodes.size)).toLong
    var sc = nodes.map(_ -> scale).toMap
    for (_ <- 1 to 2) {
      val m = nodes.map(n => n -> edges.filter(_._2 == n)
        .map { case (s, _, w) => (BigInt(sc(s)) * w / wd(s)).toLong }
        .map(BigInt(_)).sum).toMap
      sc = nodes.map(n => n -> (base + (BigInt(85) * m(n) / 100)).toLong).toMap
    }
    val out = PageRank.weightedScores(edges.toDF("s", "d", "w"),
        "s", "d", "w", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === sc)
  }
}
