package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dictionary phrase tagging — which documents contain which phrases
  * from a phrase table, as WHOLE-TOKEN windows ("cat" must not match
  * inside "catalog"): blocklist screening, entity/keyword tagging, and
  * license-fragment detection over a curation corpus.
  *
  * Shape for 100 TB: the corpus is scanned ONCE. Each document emits
  * its token n-grams for exactly the lengths the dictionary contains
  * (in-row window expansion over the tokenized array — the [[Gram]]
  * projection discipline keeps tokenization evaluated once per row),
  * and matching is a plain equi join on the gram string: candidates
  * are bounded by true token-window hits, never doc×phrase. The
  * distinct-length collect is dictionary-metadata-bounded (a handful
  * of ints — the [[IvfIndex]] k-bounded-collect precedent); the phrase
  * table itself stays distributed, so a million-phrase blocklist works
  * (broadcast is the planner's call, not a structural requirement).
  *
  * A contains()-style scan (doc × phrase substring test) would be the
  * quadratic shape AND wrong at token boundaries; Aho–Corasick is the
  * single-node answer but drags a stateful automaton through every
  * executor — the n-gram equi join is the Spark-native equivalent
  * with the same asymptotics per document (windows × lengths).
  *
  * Emits (doc BIGINT, phrase id, n_hits BIGINT): one row per
  * (document, matched phrase), n_hits = number of matching windows.
  */
object DictTag {

  def tagPhrases(docs: DataFrame, idCol: String, textCol: String,
      phrases: DataFrame, phraseIdCol: String, phraseTextCol: String)
      : DataFrame = {
    val ph = phrases.select(col(phraseIdCol).as("phrase_id"),
      TextAnalysis.words(col(phraseTextCol)).as("ptoks"))
      .select(col("phrase_id"),
        array_join(col("ptoks"), " ").as("gram"),
        size(col("ptoks")).as("n"))
    // dictionary-metadata collect: the set of DISTINCT phrase lengths
    val lengths: Seq[Int] = ph.select(col("n")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    require(lengths.nonEmpty && lengths.head >= 1, "empty dictionary")

    // tokenize in its OWN projection (multiply-referenced downstream)
    val toked = docs.select(col(idCol).cast("long").as("doc"),
      TextAnalysis.words(col(textCol)).as("toks"))
    val grams: Column = flatten(array(lengths.map { n =>
      // guard: sequence(1, 0) would generate DESCENDING [1, 0]
      when(size(col("toks")) >= n,
        transform(sequence(lit(1), size(col("toks")) - n + 1),
          i => array_join(slice(col("toks"), i, lit(n)), " ")))
        .otherwise(array())
    }: _*))
    toked.select(col("doc"), explode(grams).as("gram"))
      .join(ph, "gram")
      .groupBy(col("doc"), col("phrase_id"))
      .agg(count(lit(1)).as("n_hits"))
  }
}
