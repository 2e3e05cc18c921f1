package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end curation report: hand-checked stage counters through the
  * media gate and the assembly stages (mixture can EXCEED its input —
  * copies are honest; budget and pack use copy-aware deterministic
  * orders). The funnel gates themselves are CurationFunnelSpec's job. */
class CurationE2eSpec extends SparkSpec {
  import spark.implicits._

  // every doc passes gates 1-5 comfortably; doc 2 is a byte-duplicate
  // of doc 1 (text dedup drops it); doc 3's media lost its election
  private val base = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away to the old stone house near the green river " +
    "bank where it sleeps"
  private def docs = Seq(
    (1L, base, "en"),
    (2L, base, "en"),
    (3L, base + " extra", "en"),
    (4L, base + " other words", "de"))
    .toDF("doc_id", "text", "lang")

  test("stage counters: text dedup, media gate, mixture copies, " +
      "budget cut, pack bins — all hand-checked") {
    val mediaDrop = Seq(3L).toDF("doc_id")
    val rep = CurationE2e.report(docs, docs, "doc_id", "text", "lang",
      keepLangs = Seq("en", "de"), minTokens = 5L, maxTokens = 100L,
      minQuality = 0.0, stopwords = Seq("the", "and"), maxDupFrac = 0.99,
      maxNll = 100.0, mediaDrop = mediaDrop,
      upFactors = Map("en" -> 2.0, "de" -> 1.0),
      budgets = Map("en" -> 1000L, "de" -> 10L), packTokens = 30L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val toks = base.split("\\s+").length.toLong // 29
    // gates 1-5 pass all 4 docs
    assert(rep(1L)._2 === 4 && rep(5L)._3 === 4)
    // stage 6: doc 2 loses the keep-min election against doc 1
    assert(rep(6L) === (("dedup", 4L, 3L, toks + (toks + 1) + (toks + 2))))
    // stage 7: doc 3's media was dropped
    assert(rep(7L) === (("media_dedup", 3L, 2L, toks + (toks + 2))))
    // stage 8: en x2.0 -> doc 1 twice; de x1.0 -> doc 4 once
    assert(rep(8L) === (("mixture", 2L, 3L, 2 * toks + (toks + 2))))
    // stage 9: en budget 1000 keeps both copies; de budget 10 < 31
    // keeps doc 4 (greedy prefix: tokens_before 0 < 10)
    assert(rep(9L) === (("token_budget", 3L, 3L, 2 * toks + (toks + 2))))
    // stage 10: en copies pack at 30 tokens/bin: starts 0 and 29 ->
    // bins 0 and 0? no: floor(0/30)=0, floor(29/30)=0 -> ONE en bin;
    // de: one bin -> 2 bins total
    assert(rep(10L) === (("pack", 3L, 2L, 2 * toks + (toks + 2))))
  }

  test("an empty media drop list and neutral factors reduce to the " +
      "funnel + identity assembly") {
    val rep = CurationE2e.report(docs, docs, "doc_id", "text", "lang",
      keepLangs = Seq("en", "de"), minTokens = 5L, maxTokens = 100L,
      minQuality = 0.0, stopwords = Seq("the"), maxDupFrac = 0.99,
      maxNll = 100.0,
      mediaDrop = Seq.empty[Long].toDF("doc_id"),
      upFactors = Map.empty, budgets = Map("en" -> 10000L, "de" -> 10000L),
      packTokens = 1000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3))).toMap
    // 3 text-dedup survivors ride through media/mixture/budget intact
    assert(rep(7L) === ((3L, 3L)))
    assert(rep(8L) === ((3L, 3L)))
    assert(rep(9L) === ((3L, 3L)))
    // one giant bin per language
    assert(rep(10L) === ((3L, 2L)))
  }
}
