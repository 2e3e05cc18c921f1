package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram collocation mining via pointwise mutual information — the
  * corpus-statistics signal for multi-word expressions ("new york",
  * "machine learning") that tokenizer vocab building and phrase-aware
  * dedup both consume.
  *
  * PMI(x, y) = ln( P(x,y) / (P(x)·P(y)) ) with P(x,y) = c(x,y)/B over
  * adjacent-bigram occurrences and P(x) = c(x)/T over the token stream.
  * Computed as ln( (c(x,y)·T·T) / (B·c(x)·c(y)) ), every factor cast to
  * double first and associated left-to-right — the expression tree is
  * mirrored VERBATIM in the SQL oracle, so the IEEE multiply/divide
  * chain (correctly rounded, engine-independent) and the final
  * `round(·, 4)` produce bit-identical scores.
  *
  * Shape for 100 TB: the tokenized corpus is materialized ONCE
  * (localCheckpoint) and feeds three consumers (unigram counts, bigram
  * counts, the two scalar totals) — AQE would otherwise re-run the
  * parse per consumer (no sibling-stage reuse, PERF.md). Bigrams expand
  * IN-ROW from each doc's token array (no posexplode + window pass);
  * unigram/bigram counting is two word-keyed aggregates; the unigram
  * table joins back on the word key — vocabulary-sized, so NO broadcast
  * hint (a web-scale vocab outgrows an executor; the planner may still
  * broadcast small ones). Nothing pairs up: cost is O(tokens).
  *
  * `minCount` prunes rare bigrams BEFORE the stats join (the standard
  * collocation floor — PMI of a once-seen pair is noise).
  */
object Collocations {

  def pmiBigrams(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long
  ): DataFrame = {
    require(minCount >= 1, "pmiBigrams needs minCount >= 1")
    val ws = docs
      .select(col(idCol), TextAnalysis.words(col(textCol)).as("ws"))
      .localCheckpoint()

    val tokens = ws.select(explode(col("ws")).as("word"))
    val uni = tokens.groupBy(col("word")).agg(count(lit(1)).as("c"))
    // driver-side scalar totals (two tiny actions over the checkpoint),
    // mirrored as scalar subqueries in the oracle
    val t = tokens.count()
    // size guard: sequence(1, 0) is DESCENDING in Spark and would crash
    // element_at — docs with < 2 tokens contribute no bigrams
    val bigrams = ws.select(explode(expr(
      """case when size(ws) >= 2 then
        |  transform(sequence(1, size(ws) - 1),
        |    i -> struct(element_at(ws, i) as x, element_at(ws, i + 1) as y))
        |else array() end""".stripMargin)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val b = bigrams.count()
    val bi = bigrams.groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minCount)

    // + 0.0 normalizes IEEE negative zero: a tiny negative PMI rounds to
    // -0.0 in engines that round the binary value (DuckDB) but +0.0 via
    // BigDecimal (Spark) — the values are =-equal yet hash differently
    val pmi = round(log(
      (col("cxy").cast("double") * (lit(t.toDouble) * lit(t.toDouble))) /
        (lit(b.toDouble) * col("cx").cast("double") * col("cy").cast("double"))),
      4) + lit(0.0)
    bi
      .join(uni.select(col("word").as("x"), col("c").as("cx")), Seq("x"))
      .join(uni.select(col("word").as("y"), col("c").as("cy")), Seq("y"))
      .select(col("x"), col("y"), col("cxy"), pmi.as("pmi"))
  }
}
