package graft.ext

import graft.SparkSpec

class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val positives = Seq((1L, 3L), (1L, 7L), (2L, 3L)).toDF("user", "item")
  private val items = (1L to 10L).toDF("item_id")

  test("emits k deterministic in-domain negatives per positive") {
    val out = NegativeSampling.uniformNegatives(
      positives, "user", "item", items, "item_id", k = 3)
    val rows = out.as[(Long, Long, Int, Long)].collect()
    assert(rows.length <= 9 && rows.length >= 7) // ≤ k·n, minus collisions
    assert(rows.forall { case (_, _, j, neg) => j >= 0 && j < 3 &&
      neg >= 1 && neg <= 10 })
    // reproducible: second run bit-identical
    val again = NegativeSampling.uniformNegatives(
      positives, "user", "item", items, "item_id", k = 3)
      .as[(Long, Long, Int, Long)].collect()
    assert(rows.sortBy(r => (r._1, r._2, r._3)).toSeq ==
      again.sortBy(r => (r._1, r._2, r._3)).toSeq)
  }

  test("an empty item dimension fails loudly instead of silently dropping rows") {
    val err = intercept[Exception] {
      NegativeSampling.uniformNegatives(
        positives, "user", "item",
        items.filter($"item_id" > 100), "item_id", k = 2).collect()
    }
    assert(err.getMessage.contains("item dimension is empty") ||
      Option(err.getCause).exists(_.getMessage.contains("item dimension is empty")))
  }

  test("never emits the positive itself; different (user, item, j) differ") {
    val out = NegativeSampling.uniformNegatives(
      positives, "user", "item", items, "item_id", k = 5)
      .as[(Long, Long, Int, Long)].collect()
    assert(out.forall { case (_, item, _, neg) => neg != item })
    // sanity: the hash varies across j for a fixed positive
    val negsOfOne = out.filter(r => r._1 == 1L && r._2 == 3L).map(_._4).toSet
    assert(negsOfOne.size >= 2)
  }
}
