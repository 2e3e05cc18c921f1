package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for sketch-guided exact heavy hitters: the OUTPUT must be
  * bit-identical to a brute-force exact count regardless of capacity
  * pressure, partitioning, or merge order — the sketch is only allowed
  * to change the plan, never the answer.
  */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed stream: hot items with harmonic counts + a cold unique tail. */
  private def skewed(nHot: Int, hotBase: Int, nCold: Int): Seq[String] = {
    val hot = (1 to nHot).flatMap(i => Seq.fill(hotBase / i)(s"hot$i"))
    val cold = (1 to nCold).map(j => s"cold$j")
    // deterministic interleave so hot items aren't clustered in one
    // partition — the arrangement MG is most sensitive to is hostile
    // ordering, so shuffle deterministically by md5 of position
    (hot ++ cold).zipWithIndex
      .sortBy { case (_, i) =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(i.toString.getBytes).map("%02x".format(_)).mkString
      }
      .map(_._1)
  }

  private def brute(items: Seq[String], shareDen: Long): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * shareDen >= n }.toMap
  }

  test("exact equality vs brute force across partitionings") {
    val items = skewed(nHot = 50, hotBase = 1000, nCold = 20000)
    val expected = brute(items, shareDen = 200)
    assert(expected.nonEmpty, "fixture must actually have heavy hitters")
    for (parts <- Seq(1, 3, 8)) {
      val df = items.toDF("item").repartition(parts)
      val got = FrequentItems
        .exactHeavyHitters(df, "item", shareDen = 200, capacity = 1024)
        .as[(String, Long)].collect().toMap
      assert(got == expected, s"mismatch at $parts partitions")
    }
  }

  test("capacity pressure (decrements + merge truncation) never loses a heavy") {
    // 5000 distinct cold items vs capacity 64: the buffer decrements
    // constantly and every partition merge truncates — the guarantee
    // (shareDen=50 < capacity+1=65) must still hold
    val items = skewed(nHot = 10, hotBase = 2000, nCold = 5000)
    val expected = brute(items, shareDen = 50)
    assert(expected.nonEmpty)
    val got = FrequentItems
      .exactHeavyHitters(items.toDF("item").repartition(8), "item",
        shareDen = 50, capacity = 64)
      .as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("candidate set is a superset of everything above n/(capacity+1)") {
    val items = skewed(nHot = 30, hotBase = 500, nCold = 3000)
    val (total, cands) = FrequentItems
      .summary(items.toDF("item").repartition(8), "item", capacity = 128)
    assert(total == items.size.toLong)
    val candSet = cands.map(_._1).toSet
    val mustHave = items.groupBy(identity).view.mapValues(_.size.toLong)
      .collect { case (it, c) if c * 129 > total => it }.toSet
    assert(mustHave.subsetOf(candSet),
      s"missing guaranteed candidates: ${mustHave -- candSet}")
  }

  test("nulls are ignored in counts and in the total") {
    val df = (Seq.fill(90)(Some("a")) ++ Seq.fill(10)(Option.empty[String]))
      .toDF("item")
    val got = FrequentItems
      .exactHeavyHitters(df, "item", shareDen = 2, capacity = 16)
      .as[(String, Long)].collect().toMap
    // total is 90 non-null items, so 'a' at 90 occurrences qualifies
    assert(got == Map("a" -> 90L))
  }

  test("no heavy hitters -> empty result; empty input -> empty result") {
    val allDistinct = (1 to 1000).map(i => s"u$i").toDF("item")
    assert(FrequentItems
      .exactHeavyHitters(allDistinct, "item", shareDen = 100, capacity = 512)
      .isEmpty)
    val empty = Seq.empty[String].toDF("item")
    assert(FrequentItems
      .exactHeavyHitters(empty, "item", shareDen = 100, capacity = 512)
      .isEmpty)
  }

  test("threshold below the sketch guarantee is rejected") {
    val df = Seq("a").toDF("item")
    intercept[IllegalArgumentException] {
      FrequentItems.exactHeavyHitters(df, "item", shareDen = 1000,
        capacity = 512)
    }
  }
}
