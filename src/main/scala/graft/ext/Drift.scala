package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift monitoring: per-word Kullback-Leibler contributions
  * between two corpora's unigram distributions — the "did my filter /
  * new crawl shift the data?" check a production pipeline runs before
  * shipping a dataset revision. Σ contrib = KL(A ‖ B) in micro-nats.
  *
  * Probabilities use add-1 smoothing over the UNION vocabulary
  * (p = (c+1)/(t+V)), so words on one side only still contribute and
  * nothing divides by zero. Emitted per word:
  *   contrib_unats = round( p_a · ln(p_a / p_b) · 10⁶, 4 ) + 0
  * with every factor cast to double and associated exactly as the SQL
  * oracle writes it; `+ 0` normalizes IEEE negative zero (tiny negative
  * contributions round to -0.0 in binary-rounding engines).
  *
  * Shape for 100 TB: each corpus collapses to its unigram histogram
  * (one explode + one word-keyed aggregate each), a full-outer join on
  * the word key aligns them, and the three scalar totals (t_a, t_b, V)
  * come from ONE aggregate over the joined frame — materialized once,
  * since the final projection consumes it again. Cost is O(tokens);
  * nothing pairs up; the hot key is the vocabulary itself, uniform by
  * construction.
  */
object Drift {

  def vocabKl(
      corpusA: DataFrame, corpusB: DataFrame,
      idCol: String, textCol: String
  ): DataFrame = {
    def counts(df: DataFrame, cName: String): DataFrame = df
      .select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as(cName))

    val joined = counts(corpusA, "c_a")
      .join(counts(corpusB, "c_b"), Seq("word"), "full_outer")
      .select(col("word"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .localCheckpoint() // totals action + final projection both read it

    val totals = joined.agg(sum(col("c_a")), sum(col("c_b")), count(lit(1)))
      .collect()(0)
    val (ta, tb, v) = (totals.getLong(0), totals.getLong(1), totals.getLong(2))

    val pa = (col("c_a") + lit(1L)).cast("double") / lit((ta + v).toDouble)
    val pb = (col("c_b") + lit(1L)).cast("double") / lit((tb + v).toDouble)
    joined.select(col("word"), col("c_a"), col("c_b"),
      (round(pa * log(pa / pb) * lit(1.0e6), 4) + lit(0.0)).as("contrib_unats"))
  }
}
