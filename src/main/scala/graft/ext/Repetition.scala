package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Within-document repetition signals — the Gopher/C4-style quality
  * filters that catch boilerplate and degenerate generations: a document
  * whose words are mostly repeats of a few phrases is template spam, not
  * prose, no matter how long it is.
  *
  * Emits per document:
  *   - `dup_word_frac`   — 1 − distinct(words)/words: how much of the
  *     document is re-used vocabulary.
  *   - `top_bigram`      — the most frequent word bigram (ties broken
  *     lexicographically, so the answer is engine-independent).
  *   - `top_bigram_frac` — occurrences(top bigram)/(words − 1): how much
  *     of the document is one repeated phrase.
  * Both fractions are exact integer ratios rounded half-up to 4 dp via
  * the shared [[TextAnalysis.halfUp4]] integer-floor formulation
  * (bit-identical in any engine; `round(double, 4)` is not).
  *
  * Shape for 100 TB: word/distinct counts are codegen array arithmetic
  * on the scan (no shuffle); the bigram histogram is one explode +
  * hash-aggregate keyed (doc, bigram) and an argmax window keyed doc —
  * everything partitions by document, nothing is corpus-global, so the
  * operator scales linearly and never concentrates a hot key (a
  * document's bigram count is bounded by its own length). Single-word
  * documents have no bigram: frac 0, top_bigram NULL.
  */
object Repetition {
  import TextAnalysis.halfUp4

  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = TextAnalysis.words(col(textCol))
    val base = docs.select(
      col(idCol),
      ws.as("ws"),
      size(ws).cast("long").as("n_words"),
      size(array_distinct(ws)).cast("long").as("n_distinct"))

    // bigrams: zip the array with itself shifted by one — stays codegen
    val bigrams = base.select(
      col(idCol),
      explode(zip_with(
        slice(col("ws"), lit(1), greatest(size(col("ws")) - 1, lit(0))),
        slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("bigram"))

    val counts = bigrams
      .groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("n_occ"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("n_occ").desc, col("bigram"))
    val top = counts
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col(idCol), col("bigram").as("top_bigram"), col("n_occ"))

    // left join back so 0/1-word documents keep a row (no bigram → 0/NULL)
    base.drop("ws").join(top, Seq(idCol), "left").select(
      col(idCol),
      halfUp4(col("n_words") - col("n_distinct"),
        greatest(col("n_words"), lit(1L))).as("dup_word_frac"),
      col("top_bigram"),
      coalesce(
        halfUp4(col("n_occ"), greatest(col("n_words") - 1L, lit(1L))),
        lit(0.0)).as("top_bigram_frac"))
  }
}
