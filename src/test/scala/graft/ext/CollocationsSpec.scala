package graft.ext

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("collocated pair scores above independent pairs; minCount prunes") {
    // "new york" always adjacent; "red" and "blue" never adjacent to each
    // other; "rare pair" appears once (pruned by minCount = 2)
    val docs = Seq(
      (1L, "new york red car"),
      (2L, "blue car new york"),
      (3L, "new york blue sky"),
      (4L, "red sky rare pair")
    ).toDF("doc_id", "text")
    val out = Collocations.pmiBigrams(docs, "doc_id", "text", minCount = 2)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out.contains(("new", "york")))
    assert(out(("new", "york"))._1 == 3L)
    assert(!out.contains(("rare", "pair"))) // below the count floor
    // "new york": P(x,y) = 3/12 bigrams, P(new) = P(york) = 3/16 tokens
    // → PMI = ln( (3 · 16 · 16) / (12 · 3 · 3) ) = ln(64/9)
    val expected = BigDecimal(math.log(3.0 * 16 * 16 / (12.0 * 3 * 3)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("new", "york"))._2 == expected)
  }

  test("documents with fewer than two tokens contribute no bigrams") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b a b")).toDF("doc_id", "text")
    val out = Collocations.pmiBigrams(docs, "doc_id", "text", minCount = 2)
      .as[(String, String, Long, Double)].collect()
    // only "a b" repeats (twice); "b a" occurs once
    assert(out.map(r => (r._1, r._2)).toSet == Set(("a", "b")))
  }
}
