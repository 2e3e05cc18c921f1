package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The WHOLE curation pipeline as one audited run — [[CurationFunnel]]'s
  * six text gates extended across modalities and through the dataset-
  * assembly stages a pretraining corpus actually ships with:
  *
  *   1–6  the funnel gates (lang / length / quality / repetition /
  *        perplexity / text exact-dedup) — [[CurationFunnel.gates]],
  *        one definition shared with `q_corpus_funnel`;
  *   7    `media_dedup` — a doc drops when any of its attached media
  *        (image/audio/video fingerprints, the `q_media_dedup_keep`
  *        closure) lost its near-dup cluster's keep-min election;
  *   8    `mixture` — fractional per-language up/down-sampling
  *        ([[Sampling.upsample]]; rows may EXCEED n_in — honest copies,
  *        `copy_idx` disambiguates);
  *   9    `token_budget` — per-language greedy-prefix token budgets in
  *        deterministic hash-rank order ([[Sampling.tokenBudget]]'s
  *        rule with the copy-aware (md5, id, copy_idx) tie-break — the
  *        row set must be a pure function of the data, copies
  *        included);
  *   10   `pack` — fixed-budget sequence packing ([[Packing]]'s rule
  *        under the same (md5, id, copy_idx) order as stage 9 — one
  *        total order through assembly, and hash rank IS the
  *        trainer-shuffled order); n_out = PACKED BINS, the unit
  *        downstream training jobs consume.
  *
  * One row per stage: (stage, gate, n_in, n_out, tokens_out) — counts
  * are BIGINT-exact, every rule is deterministic, and the whole report
  * replays in SQL (the `q_e2e_curation` oracle), so the pipeline's
  * end-to-end behavior hash-gates at every scale factor.
  *
  * Scale shape: stages 1–7 are the funnel's scan arithmetic + one
  * broadcast join against the (bounded) media drop list; 8 is a row
  * explode; 9 and 10 are two-level exact prefix sums
  * ([[PrefixSums.hashOrderedExclusiveSum]]) — windows partitioned by
  * (language, hash shard), so the dominant language never serializes
  * through one task. No stage introduces driver-side state beyond the
  * final 10-row report.
  */
object CurationE2e {

  def report(docs: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, langCol: String, keepLangs: Seq[String],
      minTokens: Long, maxTokens: Long, minQuality: Double,
      stopwords: Seq[String], maxDupFrac: Double, maxNll: Double,
      mediaDrop: DataFrame, upFactors: Map[String, Double],
      budgets: Map[String, Long], packTokens: Long): DataFrame = {
    require(packTokens >= 1, s"packTokens must be >= 1: $packTokens")
    val gated = CurationFunnel.gates(docs, reference, idCol, textCol,
      langCol, keepLangs, minTokens, maxTokens, minQuality, stopwords,
      maxDupFrac, maxNll)
    // media gate: the drop list is bounded by the media count — safe
    // broadcast; docs without media (or with all-kept media) pass
    val g7 = gated.join(
        broadcast(mediaDrop.select(col(idCol), lit(true).as("__mdrop"))
          .distinct()),
        Seq(idCol), "left")
      .withColumn("p7",
        coalesce(col("p6"), lit(false)) && col("__mdrop").isNull)
      .localCheckpoint(false) // counters + survivor stages both read it
      // (LAZY: every consumer funnels into the one final union action,
      // whose job materializes these blocks once — Walks discipline)

    val names = Seq("lang", "length", "quality", "repetition",
      "perplexity", "dedup", "media_dedup")
    val wide = g7.agg(
      count(lit(1)).as("c0"),
      (1 to 7).flatMap { k =>
        Seq(count(when(col(s"p$k"), 1)).as(s"c$k"),
          coalesce(sum(when(col(s"p$k"), col("toks"))), lit(0L))
            .as(s"t$k"))
      }: _*)
    val docStages = wide.select(explode(array((1 to 7).map { k =>
        struct(lit(k.toLong).as("stage"), lit(names(k - 1)).as("gate"),
          col(s"c${k - 1}").as("n_in"), col(s"c$k").as("n_out"),
          col(s"t$k").as("tokens_out"))
      }: _*)).as("r"))
      .select(col("r.*"))

    val surv = g7.filter(col("p7"))
      .select(col(idCol), col("lang"), col("toks"))
    val mixed = Sampling.upsample(surv, idCol, "lang", upFactors)
      .localCheckpoint(false)

    // stage 9: tokenBudget's rule with the copy-aware tie-break — two
    // copies of one doc share its md5 rank, so copy_idx must break the
    // tie or the window's token attribution (and the kept ROW SET at a
    // budget boundary) would be nondeterministic. Two-level prefix sums
    // (PrefixSums): the dominant language never serializes one task.
    val budgetCol = budgets.toSeq.sortBy(_._1)
      .foldRight(lit(0L): Column) { case ((d, b), elseCol) =>
        when(col("lang") === d, lit(b)).otherwise(elseCol)
      }
    val kept = PrefixSums.hashOrderedExclusiveSum(mixed, Seq("lang"),
        idCol, "toks", tieCols = Seq("copy_idx"),
        outCol = "tokens_before")
      .filter(col("tokens_before") < budgetCol)
      .localCheckpoint(false)

    // stage 10: the packing rule under the SAME (md5, id, copy_idx)
    // total order as stage 9 — one order through assembly, and the hash
    // rank is the trainer-shuffled order (adjacent ids land far apart,
    // Splits.shardOrder's point). Same two-level prefix-sum shape.
    val packed = PrefixSums.hashOrderedExclusiveSum(
        kept.drop("tokens_before"), Seq("lang"), idCol, "toks",
        tieCols = Seq("copy_idx"), outCol = "start_tok")
      .withColumn("pack_id", floor(col("start_tok") / packTokens))

    // each assembly stage is one 1-row aggregate pair stitched with a
    // broadcast cross join (constant injection — the repo-wide pattern)
    val stage8 = g7.agg(count(when(col("p7"), 1)).as("n_in"))
      .crossJoin(broadcast(mixed.agg(count(lit(1)).as("n_out"),
        coalesce(sum(col("toks")), lit(0L)).as("tokens_out"))))
      .select(lit(8L).as("stage"), lit("mixture").as("gate"),
        col("n_in"), col("n_out"), col("tokens_out"))
    val stage9 = mixed.agg(count(lit(1)).as("n_in"))
      .crossJoin(broadcast(kept.agg(count(lit(1)).as("n_out"),
        coalesce(sum(col("toks")), lit(0L)).as("tokens_out"))))
      .select(lit(9L).as("stage"), lit("token_budget").as("gate"),
        col("n_in"), col("n_out"), col("tokens_out"))
    val stage10 = kept.agg(count(lit(1)).as("n_in"))
      .crossJoin(broadcast(packed.agg(
        countDistinct(col("lang"), col("pack_id")).as("n_out"),
        coalesce(sum(col("toks")), lit(0L)).as("tokens_out"))))
      .select(lit(10L).as("stage"), lit("pack").as("gate"),
        col("n_in"), col("n_out"), col("tokens_out"))
    docStages
      .unionByName(stage8).unionByName(stage9).unionByName(stage10)
  }
}
