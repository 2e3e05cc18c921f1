package graft.ext

import graft.SparkSpec

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def draw(rows: Seq[(Long, String, Long)], n: Int) =
    Sampling.weightedFixedSize(rows.toDF("id", "g", "w"),
        Seq("g"), "id", "w", n)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3)))
      .toSeq

  test("exactly n per group (or the whole group when smaller)") {
    val rows = (1L to 40L).map(i => (i, if (i <= 30) "a" else "b", 10L))
    val out = draw(rows, 12)
    assert(out.count(_._1 == "a") === 12)
    assert(out.count(_._1 == "b") === 10) // only 10 rows exist
  }

  test("deterministic: repeated draws select the same rows") {
    val rows = (1L to 50L).map(i => (i, "g", i))
    assert(draw(rows, 7) === draw(rows, 7))
  }

  test("weight-proportional: heavy rows dominate across disjoint trials") {
    // 200 trials (disjoint groups): one heavy row (w=50) vs 9 light
    // (w=1) — A-ES picks the heavy row's u^(1/50) key first far more
    // often than 1/10; with the deterministic coin this is a fixed
    // property of the hash, not a flaky statistic
    val rows = for (t <- 0L until 200L; i <- 0L until 10L)
      yield (t * 100 + i, s"t$t", if (i == 0) 50L else 1L)
    val picked = draw(rows, 1)
    val heavyWins = picked.count(_._2 % 100 == 0)
    assert(heavyWins > 140, s"heavy row won only $heavyWins/200")
  }

  test("zero and negative weights are never sampled") {
    val rows = Seq((1L, "g", 0L), (2L, "g", -5L), (3L, "g", 2L))
    assert(draw(rows, 3).map(_._2) === Seq(3L))
  }

  test("uniform weights reduce to a permutation-fair uniform draw") {
    // all weights equal: ranks are a pure function of the id hash, so
    // the selection must equal the n smallest ln(u)/w keys = largest u
    val rows = (1L to 20L).map(i => (i, "g", 7L))
    val out = draw(rows, 20)
    assert(out.map(_._2).toSet === (1L to 20L).toSet)
    assert(out.map(_._3).sorted === (1 to 20))
  }
}
