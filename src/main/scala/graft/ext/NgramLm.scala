package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perplexity filtering with a bigram language model — the CCNet-style
  * quality signal (Wenzek et al. 2020, arXiv:1911.00359): train a small
  * LM on a clean REFERENCE corpus, score every candidate doc by its
  * per-token negative log-likelihood, and filter/bucket on the score.
  * Low NLL = looks like the reference; gibberish and boilerplate score
  * high. (CCNet uses a 5-gram KenLM; a bigram model with add-one
  * smoothing keeps the same discipline with exact SQL-expressible
  * arithmetic — no external model artifact.)
  *
  * Model: `p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V)`
  * over reference counts, vocab size `V` = distinct reference unigrams;
  * the first token is scored by the unigram model
  * `p(w_1) = (c(w_1) + 1) / (N + V)`, `N` = total reference tokens.
  * Per-doc NLL = −(Σ log p) / n_tokens.
  *
  * Determinism (the [[TextAnalysis.entropy]] discipline): every log term
  * is quantized to the 1e-6 grid as a BIGINT before the distributed sum;
  * all log arguments are integers, so an oracle reproduces terms exactly
  * by mirroring the formula shape `ln(cb+1) − ln(cu+V)`.
  *
  * Scale shape: the LM tables are reference-corpus-sized aggregates
  * (vocab + seen-bigram rows — bounded by the CLEAN corpus, not the
  * 100 TB candidate corpus) joined to the candidate bigram stream on
  * token keys; Spark broadcasts them when small, falls back to a
  * shuffled hash join when not. The candidate side is one explode + one
  * (doc, gram) aggregate — map-side combinable, no window, no
  * all-pairs anything. Scoring never reshuffles by anything other than
  * the doc id it already aggregates by.
  */
object NgramLm {

  /** (id, w1, gram, cnt): per-doc bigram multiset, `w1` the conditioning
    * word, plus (id, wf) first-word rows under gram = null marker. */
  private def docBigrams(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol),
        filter(TextAnalysis.words(col(textCol)), w => w =!= "").as("w"))
      .filter(size(col("w")) >= 1)

  /** Score `docs` against the LM induced by `reference`: one row per doc
    * with words — (id, n_tokens, sq, nll), `sq` the exact quantized
    * BIGINT sum of log-probs (ordering key), `nll` = −sq/1e6/n_tokens
    * rounded to 4 dp. */
  def perplexity(docs: DataFrame, reference: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val refWords = reference
      .select(filter(TextAnalysis.words(col(textCol)), w => w =!= "").as("w"))
    val uni = refWords.select(explode(col("w")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val bi = refWords
      .select(explode(expr(
        "case when size(w) >= 2 then transform(sequence(1, size(w) - 1), " +
          "i -> concat_ws(' ', slice(w, i, 2))) else array() end")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cb"))
    // scalars V (vocab) and N (token count) attach as a broadcast row
    val consts = uni.agg(count(lit(1)).as("v"), sum(col("cu")).as("n"))

    val d = docBigrams(docs, idCol, textCol)
    // first token: unigram term  ln(cu+1) − ln(n+v)
    val firstTerm = d
      .select(col(idCol), element_at(col("w"), 1).as("w1"))
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(consts))
      .select(col(idCol), lit(1L).as("toks"),
        floor((log(coalesce(col("cu"), lit(0L)) + lit(1L))
          - log(col("n") + col("v"))) * lit(1000000L)).cast("long").as("t"))
    // tokens 2..n: bigram terms  cnt · (ln(cb+1) − ln(cu+v)), cu the
    // CONDITIONING word's count (0 when unseen in the reference)
    val biTerms = d
      .select(col(idCol), explode(expr(
        "case when size(w) >= 2 then transform(sequence(1, size(w) - 1), " +
          "i -> struct(element_at(w, i) as w1, " +
          "concat_ws(' ', slice(w, i, 2)) as gram)) " +
          "else array() end")).as("g"))
      .select(col(idCol), col("g.w1").as("w1"), col("g.gram").as("gram"))
      .groupBy(col(idCol), col("w1"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .join(bi, Seq("gram"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(consts))
      .select(col(idCol), col("cnt").as("toks"),
        floor(col("cnt") * (log(coalesce(col("cb"), lit(0L)) + lit(1L))
          - log(coalesce(col("cu"), lit(0L)) + col("v")))
          * lit(1000000L)).cast("long").as("t"))

    firstTerm.unionByName(biTerms)
      .groupBy(col(idCol))
      .agg(sum(col("toks")).as("n_tokens"), sum(col("t")).as("sq"))
      .select(col(idCol), col("n_tokens"), col("sq"),
        // exact half-up 4-dp rounding of (−sq)/(1e6·n_tokens) in pure
        // BIGINT arithmetic: round(double, 4) is engine-dependent when
        // the quotient lands on a .00005 boundary (observed at sf0.1)
        (expr("(-20000 * sq + 1000000 * n_tokens) div (2000000 * n_tokens)")
          .cast("double") / 10000.0).as("nll"))
  }
}
