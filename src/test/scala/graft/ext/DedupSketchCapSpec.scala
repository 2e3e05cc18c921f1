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

  // the band/chunk cap tests need a pair with GUARANTEED banding
  // recall: a byte-identical small dup group (df = 2, far under the
  // cap) collides on every band/chunk, whereas a merely-similar pair
  // may probabilistically miss all bands (the prefix-filter family
  // above has exact candidate recall, so it can use a similar pair)
  private val dupPair = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa")
  private def bandDocs = (flood ++ dupPair ++ lone).toDF("doc_id", "text")

  test("minhash band cap: the flood's bands are capped out of " +
      "generation; the small dup group keeps its exact Jaccard") {
    val uncapped = Dedup.minhashLshPairs(bandDocs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bandSize = 4, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // identical flood docs share EVERY band: the quadratic adversary
    assert(uncapped.count { case (a, b) => a >= 100L && b >= 100L } === 190)
    assert(uncapped.contains((1L, 2L)))

    val capped = Dedup.minhashLshPairs(bandDocs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bandSize = 4, threshold = 0.5,
      bandHotMinEst = Some(10L))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    // every flood band has df = 20 ≥ minEst and est ≥ df — capped;
    // flood pairs vanish entirely
    assert(!capped.keySet.exists { case (a, b) => a >= 100L && b >= 100L },
      capped.keySet.toString)
    // the dup pair's bands have df = 2 < minEst (false-hot collision
    // astronomically unlikely at w=65536 over ~70 band keys) — kept,
    // exact full-set score
    assert(capped.get((1L, 2L)) === Some(1.0), capped.keySet.toString)
  }

  test("simhash chunk cap: the flood's chunks are capped; the small " +
      "dup group survives exact hamming verification") {
    val uncapped = Dedup.simhashPairs(bandDocs, "doc_id", "text",
      maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.count { case (a, b) => a >= 100L && b >= 100L } === 190)
    assert(uncapped.contains((1L, 2L)))

    val capped = Dedup.simhashPairs(bandDocs, "doc_id", "text",
      maxHamming = 3, chunkHotMinEst = Some(10L))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // identical flood docs share every chunk with df = 20 ≥ minEst —
    // all four bands capped, flood pairs gone
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L },
      capped.toString)
    // the dup pair's chunks have df = 2 — kept (hamming 0)
    assert(capped.contains((1L, 2L)), capped.toString)
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
