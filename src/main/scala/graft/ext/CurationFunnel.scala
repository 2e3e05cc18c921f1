package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus curation funnel — the Dolma/C4/RefinedWeb
  * ingest shape: a fixed sequence of keep/drop gates, each reusing one
  * of this library's per-doc signals, reported as ONE AUDIT ROW PER
  * STAGE (docs in, kept, dropped, tokens dropped) — the run report a
  * data-curation team actually reads, same spirit as the topology
  * step-stats report (`q_topology_stats`).
  *
  * Stages (sequential — a doc is evaluated by stage k only if it passed
  * 1..k−1, so each counter attributes a drop to exactly one gate):
  *   1 `lang`        — language allowlist (metadata column)
  *   2 `length`      — token count in [minTokens, maxTokens]
  *   3 `quality`     — [[TextAnalysis.qualityScore]] ≥ minQuality
  *   4 `repetition`  — dup-word fraction ≤ maxDupFrac (the map-only
  *                     Gopher signal, exact half-up arithmetic)
  *   5 `perplexity`  — [[NgramLm.perplexity]] NLL ≤ maxNll against the
  *                     supplied clean reference corpus
  *   6 `dedup`       — exact dedup: keep the min-id doc per normalized
  *                     fingerprint AMONG SURVIVORS (dedup last, so a
  *                     duplicate of an already-dropped doc charges the
  *                     gate that dropped it, not the dedup stage)
  *
  * Scale shape: stages 1–4 are per-row codegen arithmetic on the scan
  * (zero shuffles); stage 5 is the NgramLm join (LM tables bounded by
  * the reference corpus); stage 6 is one fingerprint aggregate over
  * stage-5 survivors. The report is a 6-row conditional aggregate —
  * map-side combinable, one exchange. Nothing in the funnel is
  * corpus-global except the counters themselves.
  */
object CurationFunnel {

  /** The per-doc gate frame behind [[report]]: (idCol, lang, toks,
    * quality, dup_frac, fp, nll, p1..p6) — exposed so compositions that
    * need the SURVIVOR SET (the end-to-end curation pipeline,
    * `q_e2e_curation`) share one definition of the gates with the
    * counter report. */
  def gates(docs: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, langCol: String, keepLangs: Seq[String],
      minTokens: Long, maxTokens: Long, minQuality: Double,
      stopwords: Seq[String], maxDupFrac: Double,
      maxNll: Double): DataFrame = {
    val ws = TextAnalysis.words(col(textCol))
    val base = docs.select(
      col(idCol), col(langCol).as("lang"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("toks"),
      TextAnalysis.qualityScore(col(textCol), stopwords).as("quality"),
      // dup-word fraction inline (the Repetition formula, no bigram agg)
      TextAnalysis.halfUp4(
        size(ws).cast("long") - size(array_distinct(ws)).cast("long"),
        greatest(size(ws).cast("long"), lit(1L))).as("dup_frac"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))

    val nll = NgramLm.perplexity(docs, reference, idCol, textCol)
      .select(col(idCol), col("nll"))
    val flagged = base.join(nll, Seq(idCol), "left")
      .withColumn("p1", col("lang").isin(keepLangs: _*))
      .withColumn("p2", col("p1") && col("toks").between(minTokens, maxTokens))
      .withColumn("p3", col("p2") && col("quality") >= minQuality)
      .withColumn("p4", col("p3") && col("dup_frac") <= maxDupFrac)
      .withColumn("p5",
        col("p4") && coalesce(col("nll") <= maxNll, lit(false)))
    val keepMin = flagged.filter(col("p5"))
      .groupBy(col("fp")).agg(min(col(idCol)).as("keep_id"))
    // fp-keyed join, NOT broadcast: the survivor fingerprint table is
    // corpus-sized at scale
    flagged.join(keepMin, Seq("fp"), "left")
      .withColumn("p6", col("p5") && col(idCol) === col("keep_id"))
  }

  def report(docs: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, langCol: String, keepLangs: Seq[String],
      minTokens: Long, maxTokens: Long, minQuality: Double,
      stopwords: Seq[String], maxDupFrac: Double,
      maxNll: Double): DataFrame = {
    val gated = gates(docs, reference, idCol, textCol, langCol, keepLangs,
      minTokens, maxTokens, minQuality, stopwords, maxDupFrac, maxNll)

    val wide = gated.agg(
      count(lit(1)).as("c0"),
      (1 to 6).flatMap { k =>
        val prev = if (k == 1) lit(true) else col(s"p${k - 1}")
        Seq(count(when(col(s"p$k"), 1)).as(s"c$k"),
          coalesce(sum(when(prev && !col(s"p$k"), col("toks"))), lit(0L))
            .as(s"td$k"))
      }: _*)
    val names = Seq("lang", "length", "quality", "repetition",
      "perplexity", "dedup")
    wide.select(explode(array((1 to 6).map { k =>
        struct(lit(k.toLong).as("stage"), lit(names(k - 1)).as("gate"),
          col(s"c${k - 1}").as("n_in"), col(s"c$k").as("n_kept"),
          (col(s"c${k - 1}") - col(s"c$k")).as("n_dropped"),
          col(s"td$k").as("tokens_dropped"))
      }: _*)).as("r"))
      .select(col("r.*"))
  }
}
