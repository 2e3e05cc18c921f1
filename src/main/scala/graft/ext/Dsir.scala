package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection: score every raw-corpus document by how much
  * its hashed n-gram distribution looks like a TARGET corpus, then keep
  * the top-scoring docs (Data Selection via Importance Resampling,
  * Xie et al. 2023, arXiv:2302.03169 — the hashed-ngram variant).
  *
  * Model: unigram+bigram features hashed into `buckets` buckets; both
  * corpora induce add-one-smoothed bucket distributions p_t (target) and
  * p_r (raw); a doc's log importance weight is
  * `Σ_b cnt_doc[b] · (ln p_t[b] − ln p_r[b])` — a bag-of-buckets
  * log-likelihood ratio. Docs that look like the target get positive
  * weights, boilerplate that dominates the raw crawl gets negative ones.
  *
  * Determinism (the same discipline as [[TextAnalysis.entropy]]): the
  * Σ is a distributed SUM whose float addition order varies per run, so
  * each per-(doc,bucket) term is quantized to the 1e-6 grid
  * (`floor(x·1e6)` as BIGINT) and the sum runs in exact integers,
  * order-independent; only the final per-doc value is rounded (4 dp).
  * All `ln` arguments are integers (smoothed counts and totals), so an
  * oracle reproduces terms bit-for-bit by mirroring the exact formula
  * shape `ln(tc+1) − ln(tden) − ln(rc+1) + ln(rden)`.
  *
  * Scale shape (100 TB raw corpus): feature extraction is one explode +
  * one hash aggregate per corpus (map-side combinable); the two bucket
  * distributions are ≤ `buckets` rows each — broadcast to the per-doc
  * join, so scoring never shuffles the corpus. Selection: at scale use a
  * WEIGHT THRESHOLD (map-only filter on the scored frame) or
  * [[selectTopK]], which compiles to TakeOrderedAndProject (per-partition
  * top-k heaps + driver merge of k) — no global sort materializes.
  */
object Dsir {

  /** Hashed unigram+bigram counts, one (id, bucket, cnt) row per distinct
    * bucket a doc touches. Bucket = `md5(gram)` 4-nibble prefix value mod
    * `buckets` ([[Splits.hashBucket]] arithmetic — engine-reproducible).
    * Docs with no words yield no rows (same contract as shingles). */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= 65536,
      "buckets must be in [2, 65536] (md5 prefix is 4 nibbles)")
    df.select(col(idCol),
        filter(TextAnalysis.words(col(textCol)), w => w =!= "").as("w"))
      .select(col(idCol), explode(concat(col("w"), expr(
        "case when size(w) >= 2 then " +
          "transform(sequence(1, size(w) - 1), " +
          "i -> concat_ws(' ', slice(w, i, 2))) " +
          "else array() end"))).as("g"))
      .select(col(idCol),
        (Splits.hashBucket(col("g"), 4) % buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Score every `raw` doc: (id, n_feat, sq, logw) where `sq` is the
    * exact quantized-sum BIGINT (ordering key) and `logw = sq/1e6`
    * rounded to 4 dp (reporting value). `n_feat` counts the doc's gram
    * occurrences. Both corpus distributions are computed here; pass the
    * SAME `buckets` used downstream. */
  def weights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 256): DataFrame = {
    val rawFeat = hashedFeatures(raw, idCol, textCol, buckets)
    val tgtFeat = hashedFeatures(target, idCol, textCol, buckets)
    val rawDist = rawFeat.groupBy(col("bucket")).agg(sum(col("cnt")).as("rc"))
    val tgtDist = tgtFeat.groupBy(col("bucket")).agg(sum(col("cnt")).as("tc"))
    // corpus totals: one-row aggregates attached by broadcast cross join
    // (the Relevance.scala scalar-attach pattern — no driver collect)
    val totals = rawDist.agg(sum(col("rc")).as("rtot"))
      .crossJoin(tgtDist.agg(sum(col("tc")).as("ttot")))
    val terms = rawFeat
      .join(broadcast(rawDist), Seq("bucket"))
      .join(broadcast(tgtDist), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("cnt"),
        // exact formula shape mirrored by the oracle; all ln args are
        // integer-valued doubles (add-one smoothing keeps them positive)
        floor(col("cnt") *
          (log(coalesce(col("tc"), lit(0L)) + lit(1L))
            - log(col("ttot") + lit(buckets.toLong))
            - log(col("rc") + lit(1L))
            + log(col("rtot") + lit(buckets.toLong)))
          * lit(1000000L)).cast("long").as("t"))
    terms.groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_feat"), sum(col("t")).as("sq"))
      .select(col(idCol), col("n_feat"), col("sq"),
        (round(col("sq").cast("double") / 1000000.0, 4) + lit(0.0))
          .as("logw"))
  }

  /** Keep the k most-target-like raw docs. Ordering is exact and total
    * (BIGINT `sq` desc, id asc), so the selection is deterministic across
    * runs and engines. Plan: TakeOrderedAndProject — per-partition heaps,
    * k rows to the driver, no full sort. */
  def selectTopK(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 256): DataFrame =
    weights(raw, target, idCol, textCol, buckets)
      .orderBy(col("sq").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("n_feat"), col("logw"))
}
