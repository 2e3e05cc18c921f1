package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch-derived hot-key caps for the n-gram pair generator: the
  * Count-Min estimate (est ≥ true, one-sided) drives the cap list, so a
  * flood's shingles can never dodge it, while rare-shingle near-dups
  * keep their exact full-set scores. */
class DedupSketchCapSpec extends SparkSpec {
  import spark.implicits._

  // a 20-doc byte-identical FLOOD (every shingle df ≥ 20 — the
  // quadratic-candidate adversary the cap exists for) + one legit
  // near-dup pair on rare shingles + one unrelated doc
  private val flood = (100L until 120L).map(i =>
    i -> "spam spam wonderful spam lovely spam spam wonderful spam again")
  private val legit = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    2L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda")
  private val lone = Seq(
    3L -> "completely different words that match nothing else at all here")
  private def docs = (flood ++ legit ++ lone).toDF("doc_id", "text")

  test("flood pairs are capped out of candidate generation; the legit " +
      "rare-shingle pair survives with its exact full-set score") {
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the flood really is the quadratic adversary: 20·19/2 pairs
    assert(uncapped.count { case (a, b) => a >= 100L && b >= 100L } === 190)
    assert(uncapped.contains((1L, 2L)))

    val capped = Dedup.ngramJaccardPairsSketchCapped(docs, "doc_id",
      "text", n = 3, threshold = 0.5, minEst = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    // every flood shingle has df = 20 ≥ minEst and est ≥ df — capped;
    // the flood's in-prefix shared shingles are ALL hot, so its pairs
    // vanish from candidate generation entirely
    assert(!capped.keySet.exists { case (a, b) => a >= 100L && b >= 100L },
      capped.keySet.toString)
    // the legit pair's shingles are rare (df = 1 or 2 < minEst at this
    // corpus size, and 4-nibble buckets at w=65536 make a colliding
    // false-hot astronomically unlikely on 30 keys) — kept, and the
    // score is the exact full-set Jaccard: 7 shared of 8+8 trigrams →
    // 7/9 = 0.7778
    assert(capped.contains((1L, 2L)), capped.keySet.toString)
    assert(capped((1L, 2L)) === 0.7778)
  }

  test("the cap never misses a hot key: est >= true df, so df >= minEst " +
      "implies membership in the derived list") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3).localCheckpoint()
    val sk = CountMin.sketch(sh.select(col("shingle")), "shingle",
      d = 4, w = 65536)
    val est = CountMin.estimate(sk, sh.select(col("shingle")), "shingle",
      d = 4, w = 65536)
    val joined = est.join(
      sh.groupBy(col("shingle")).agg(count(lit(1)).as("df")),
      col("key") === col("shingle"))
    assert(joined.filter(col("est") < col("df")).count() === 0L)
    assert(joined.filter(col("df") >= 10 && col("est") < 10).count() === 0L)
  }
}
