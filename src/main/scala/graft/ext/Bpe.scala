package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training and encoding — the
  * vocabulary-learning stage of an LLM data pipeline (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units"),
  * re-expressed as Spark aggregates so a merge table can be learned from
  * a 100 TB corpus without ever holding it in one place.
  *
  * Shape for 100 TB — the key observation is that BPE training never
  * needs the corpus after ONE pass:
  *   - the corpus is reduced to a WORD HISTOGRAM (one hash aggregate,
  *     map-side combinable; vocabulary-sized, not corpus-sized) and
  *     every subsequent round runs over that tiny table;
  *   - each round is one pair-count aggregate over the histogram plus a
  *     ONE-ROW collect (the argmax pair under a total order) — the only
  *     driver state is the merge list itself, k rows;
  *   - merges are applied as a cumulative `replace` expression CHAIN on
  *     the cached base histogram (pure codegen string ops, lineage depth
  *     = rounds, no re-caching of mutated tables).
  *
  * Symbol-sequence encoding: a word is carried as "(s1)(s2)...(sk)" —
  * each symbol wrapped in its own parentheses. This makes greedy
  * left-to-right pair merging equal to a plain leftmost-non-overlapping
  * string `replace` of "(a)(b)" with "(ab)" (boundaries can't be shared
  * between adjacent matches because each symbol owns its wrapper), which
  * keeps the whole round inside whole-stage codegen AND is expressible
  * verbatim in the ANSI-SQL oracle. Precondition: symbols must not
  * contain '(' or ')' — `wordHistogram` strips to [a-z0-9] to guarantee
  * it (the same cleanup the oracle applies).
  *
  * Determinism: the winning pair each round is the argmax under the
  * TOTAL order (count desc, left asc, right asc), so the learned table
  * is a pure function of the corpus — no hash-order or partition-order
  * dependence.
  */
object Bpe {

  /** One learned merge: rank is 1-based learning order. */
  final case class Merge(rank: Int, lhs: String, rhs: String, count: Long)

  /** [a-z0-9]-cleaned lowercase words with occurrence counts — the
    * corpus's ONLY contribution to training. (word, wcount). */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .select(regexp_replace(col("word"), "[^a-z0-9]", "").as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("wcount"))

  /** "(c1)(c2)...(ck)" initial character-symbol encoding. */
  def encodeChars(word: Column): Column =
    regexp_replace(word, "(.)", "($1)")

  /** Apply one merge to an encoded column: greedy leftmost
    * non-overlapping, exactly the reference BPE application order. */
  def applyMerge(enc: Column, lhs: String, rhs: String): Column =
    replace(enc, lit(s"($lhs)($rhs)"), lit(s"($lhs$rhs)"))

  /** Symbols of an encoded word, in order. */
  def symbols(enc: Column): Column =
    split(enc.substr(lit(2), length(enc) - 2), "\\)\\(")

  /** Learn `rounds` merges from the corpus. Per round: one aggregate
    * over the (cached) word histogram + a 1-row collect. Stops early if
    * no adjacent pair remains (every word fully fused). */
  def learn(docs: DataFrame, textCol: String, rounds: Int): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    val hist = wordHistogram(docs, textCol)
      .select(encodeChars(col("word")).as("enc"), col("wcount"))
      .persist()
    // rounds iterate the HISTOGRAM, not the corpus — right-size its
    // partitioning to the vocabulary (one task per ~4M words) so the 8
    // tiny per-round jobs aren't dominated by empty-task scheduling at
    // bench scale while a billion-word vocab still fans out
    val nWords = hist.count()
    // narrow coalesce over the cache — no second materialization
    val base = hist.coalesce(math.max(1L, nWords / 4000000L).toInt)
    try {
      val merges = Seq.newBuilder[Merge]
      var encCol: Column = col("enc")
      var done = false
      var rank = 1
      while (rank <= rounds && !done) {
        val sym = symbols(col("cur"))
        val winner = base
          .select(encCol.as("cur"), col("wcount"))
          .select(
            explode(arrays_zip(
              slice(sym, lit(1), size(sym) - 1).as("l"),
              slice(sym, lit(2), size(sym) - 1).as("r"))).as("pr"),
            col("wcount"))
          .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
          .agg(sum(col("wcount")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1)
          .collect()
        if (winner.isEmpty) done = true
        else {
          val l = winner(0).getString(0)
          val r = winner(0).getString(1)
          val c = winner(0).getLong(2)
          merges += Merge(rank, l, r, c)
          encCol = applyMerge(encCol, l, r)
          rank += 1
        }
      }
      merges.result()
    } finally { hist.unpersist(); () }
  }

  /** Encoded column after applying a fixed merge list in order. */
  def encodeWith(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(encodeChars(word)) { case (e, (l, r)) =>
      applyMerge(e, l, r)
    }

  /** Token count of an encoded word: one symbol per '('. */
  def tokenCountOf(enc: Column): Column =
    length(enc) - length(replace(enc, lit("("), lit("")))
}
