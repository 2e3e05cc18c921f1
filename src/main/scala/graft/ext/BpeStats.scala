package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-scale BPE pair statistics — the counting step of byte-pair
  * vocabulary induction (Sennrich et al. 2016, arXiv:1508.07909): how
  * often does each adjacent symbol pair occur across the corpus, and
  * which merge wins this round.
  *
  * The scale trick is the classic BPE one: never count pairs over the
  * CORPUS — reduce the corpus to its word-frequency table first (one
  * map-side-combinable aggregate; the vocabulary is tiny relative to
  * 100 TB of text and bounded by content, not size), then explode each
  * DISTINCT word into its adjacent character pairs once and weight by
  * the word's count. Pair counting over the vocabulary is millions of
  * rows where the corpus is trillions; every later merge round would
  * rewrite only the vocabulary table too.
  *
  * Ranking uses the (count desc, pair asc) TOTAL order so the winning
  * merge — and any top-k prefix — is engine-independent under ties.
  */
object BpeStats {

  /** Word-frequency table: (word, wcnt). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))

  /** Adjacent character-pair counts over the corpus, computed from the
    * vocabulary: (pair, cnt) where cnt sums each containing word's
    * corpus frequency per occurrence (overlaps count — "aaa" has two
    * "aa" pairs, matching the merge-iteration semantics). */
  def pairCounts(docs: DataFrame, textCol: String): DataFrame =
    wordCounts(docs, textCol)
      .select(col("wcnt"), explode(expr(
        "case when length(word) >= 2 then transform(" +
          "sequence(1, length(word) - 1), i -> substring(word, i, 2)) " +
          "else array() end")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wcnt")).as("cnt"))

  /** The top-k merge candidates under the deterministic total order. */
  def topPairs(docs: DataFrame, textCol: String, k: Int): DataFrame =
    pairCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("pair")).limit(k)
}
