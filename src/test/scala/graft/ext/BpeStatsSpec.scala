package graft.ext

import graft.SparkSpec

class BpeStatsSpec extends SparkSpec {
  import spark.implicits._

  test("pair counts weight by word frequency and count overlaps") {
    // "ab ab aaa" → vocab {ab:2, aaa:1}; pairs: ab→2, aa→2 ("aaa" has
    // two overlapping "aa" positions × word count 1)
    val docs = Seq((1L, "ab ab aaa")).toDF("doc_id", "text")
    val got = BpeStats.pairCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(got === Map("ab" -> 2L, "aa" -> 2L))
  }

  test("counting over the vocabulary equals counting over the corpus") {
    val docs = Seq(
      (1L, "spark spark streams"),
      (2L, "spark streams scale"),
      (3L, "scale")).toDF("doc_id", "text")
    val got = BpeStats.pairCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    // brute-force corpus-side count as the oracle
    val words = Seq("spark", "spark", "streams", "spark", "streams",
      "scale", "scale")
    val expect = words.flatMap(w => w.sliding(2).toSeq)
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    assert(got === expect)
  }

  test("single-char words contribute no pairs; top-k order is total") {
    val docs = Seq((1L, "a a a ab ac")).toDF("doc_id", "text")
    val top = BpeStats.topPairs(docs, "text", 2)
      .as[(String, Long)].collect().toSeq
    // "ab" and "ac" tie at 1 → lexicographic tiebreak
    assert(top === Seq(("ab", 1L), ("ac", 1L)))
  }
}
