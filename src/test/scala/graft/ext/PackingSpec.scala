package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // (id, shard, tokens): shard A fills pack 0 with 100+150, doc 3 starts
  // at 250 (straddles the 256 boundary → still pack 0), doc 4 lands in
  // pack 1; shard B restarts numbering from pack 0.
  private def docs = Seq(
    (1L, "A", 100), (2L, "A", 150), (3L, "A", 60), (4L, "A", 10),
    (5L, "B", 300), (6L, "B", 10)
  ).toDF("doc_id", "shard", "n_tokens")

  test("pack assignment is concat-and-chunk under the budget") {
    val out = Packing.packSequences(docs, "doc_id", "n_tokens", "shard", 256L)
      .select("doc_id", "pack_id", "pack_offset").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (0L, 0L))
    assert(out(2L) == (0L, 100L))
    assert(out(3L) == (0L, 250L))  // straddles: first token in pack 0
    assert(out(4L) == (1L, 54L))   // 310 % 256
    assert(out(5L) == (0L, 0L))    // shard B restarts
    assert(out(6L) == (1L, 44L))   // 300 % 256
  }

  test("packStats reports fill ratios capped at 1") {
    val stats = Packing.packStats(
      Packing.packSequences(docs, "doc_id", "n_tokens", "shard", 256L),
      "shard", 256L)
      .select("shard", "pack_id", "n_docs", "fill_ratio")
      .as[(String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(stats(("A", 0L)) == (3L, 1.0))  // 310 tokens start in pack 0, capped
    assert(stats(("A", 1L)) == (1L, math.rint(10.0 / 256 * 10000) / 10000))
    assert(stats(("B", 0L))._1 == 1L)
  }

  test("ngram containment: identical probe = 1.0, disjoint probe = 0.0") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
    val probes = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // fully contained
      (11L, "totally novel words never seen anywhere at all"), // disjoint
      (12L, "the quick brown fox eats something else entirely") // partial
    ).toDF("doc_id", "text")
    val out = Dedup.ngramContainment(corpus, probes, "doc_id", "text", 3)
      .select("doc_id", "containment").as[(Long, Double)].collect().toMap
    assert(out(10L) == 1.0)
    assert(out(11L) == 0.0)
    assert(out(12L) > 0.0 && out(12L) < 1.0)
  }
}
