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

  test("slice summaries -> merge-only rollup -> exact pass equals brute force") {
    // three slices with different hot sets; the rollup never sees the
    // raw items, only the persisted (total, items) summary rows
    val rows = Seq("s1", "s2", "s3").flatMap { sl =>
      skewed(nHot = 20, hotBase = 800, nCold = 4000).map(it => (sl, it + sl))
    } ++ skewed(nHot = 5, hotBase = 3000, nCold = 0)
      .map(it => ("s1", it)) // cross-slice heavies too
    val df = rows.toDF("slice", "item").repartition(7)
    val expected = brute(rows.map(_._2), shareDen = 300)
    assert(expected.nonEmpty)
    val slices = FrequentItems.sliceSummaries(df, Seq("slice"), "item",
      capacity = 1024)
    val cand = FrequentItems.rollupCandidates(slices, Nil, capacity = 1024)
    val total = slices.agg(org.apache.spark.sql.functions.sum("total"))
      .head().getLong(0)
    assert(total == rows.size.toLong)
    val got = FrequentItems.exactFromCandidates(
      df.select($"item"), "item", shareDen = 300, total,
      cand.select($"item"))
      .as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("rollup candidates keep every item above the conservative 2N/(cap+1) bound") {
    val rows = Seq("a", "b").flatMap { sl =>
      skewed(nHot = 15, hotBase = 400, nCold = 2500).map(it => (sl, it))
    }
    val df = rows.toDF("slice", "item").repartition(5)
    val slices = FrequentItems.sliceSummaries(df, Seq("slice"), "item",
      capacity = 128)
    val cand = FrequentItems.rollupCandidates(slices, Nil, capacity = 128)
      .as[(String, Long, Long)].collect()
    val n = rows.size.toLong
    val candSet = cand.map(_._1).toSet
    val mustHave = rows.map(_._2).groupBy(identity).view
      .mapValues(_.size.toLong)
      .collect { case (it, c) if c * 129 > 2 * n => it }.toSet
    assert(mustHave.nonEmpty)
    assert(mustHave.subsetOf(candSet),
      s"rollup lost guaranteed candidates: ${mustHave -- candSet}")
    assert(cand.forall(_._3 == n), "rollup total must sum slice totals")
  }

  test("grouped rollup keeps per-group guarantees independently") {
    // group g1 heavy on 'x', g2 heavy on 'y' — a rollup keyed on group
    // must surface each group's own heavy, not blend them
    val rows =
      (Seq.fill(500)("x") ++ (1 to 800).map(i => s"u$i")).map(("g1", "d1", _)) ++
      (Seq.fill(400)("y") ++ (1 to 700).map(i => s"v$i")).map(("g2", "d1", _)) ++
      (Seq.fill(300)("x") ++ (1 to 600).map(i => s"w$i")).map(("g1", "d2", _))
    val df = rows.toDF("grp", "day", "item").repartition(6)
    val slices = FrequentItems.sliceSummaries(df, Seq("grp", "day"),
      "item", capacity = 256)
    val cand = FrequentItems.rollupCandidates(slices, Seq("grp"),
      capacity = 256).as[(String, String, Long, Long)].collect()
    val g1 = cand.filter(_._1 == "g1")
    val g2 = cand.filter(_._1 == "g2")
    assert(g1.exists(_._2 == "x") && g2.exists(_._2 == "y"))
    assert(g1.forall(_._4 == 500 + 800 + 300 + 600))
    assert(g2.forall(_._4 == 400 + 700))
  }
}
