package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — the OTHER
  * production tokenizer family next to [[Bpe]] (Kudo 2018, "Subword
  * Regularization"): a piece VOCABULARY with log-probabilities, learned
  * by EM over the best (Viterbi) segmentation, instead of BPE's greedy
  * merge list.
  *
  * Shape for 100 TB — [[Bpe.learn]]'s observation holds verbatim:
  * training never needs the corpus after ONE pass. The corpus reduces
  * to the word histogram (one map-side-combinable aggregate); the seed
  * vocabulary is the top-`vocabSize` substrings (≤ `maxPieceLen`
  * chars) of that histogram by occurrence mass plus every single
  * character (so any word stays segmentable); each EM round then
  * Viterbi-segments the HISTOGRAM (vocabulary-sized, never the corpus)
  * against the current piece scores and re-counts piece usage. Piece
  * scores live on the driver between rounds — bounded by `vocabSize`,
  * the same documented bounded-collect budget as k-means centroids or
  * BPE's 1-row argmax.
  *
  * Integer-exact discipline (the [[NgramLm]] precedent): scores are
  * µ-quantized BIGINTs, `floor((ln(count + 1) − ln(total + V)) · 10⁶)`
  * with INTEGER log arguments — replayable by the SQL oracle term for
  * term, so the whole trained table hash-gates (q_unigram_train), not
  * just a summary.
  *
  * Determinism: Viterbi maximizes the quantized score sum; ties take
  * the CANONICAL segmentation — the lexicographically smallest
  * space-joined path, which (space sorting before every [a-z0-9]
  * symbol) is exactly "shortest piece first, recursively" and is what
  * the left-to-right walk below picks. The oracle selects the same
  * path by `ORDER BY score DESC, path` over enumerated segmentations.
  */
object UnigramLm {

  /** Substring-occurrence candidates over the word histogram: every
    * (position, length ≤ maxPieceLen) substring occurrence weighted by
    * its word's count. (piece, freq). */
  def candidates(hist: DataFrame, maxPieceLen: Int): DataFrame =
    // generate from every position and keep only full-length pieces:
    // a `sequence(1, len - l + 1)` upper bound would RUN DESCENDING
    // ([1, 0]) for words shorter than l and mint truncated candidates
    hist.select(explode(expr(
        s"flatten(transform(sequence(1, $maxPieceLen), " +
          "l -> filter(transform(sequence(1, length(word)), " +
          "i -> substring(word, i, l)), p -> length(p) = l)))")).as("piece"),
      col("wcount"))
      .groupBy(col("piece"))
      .agg(sum(col("wcount")).as("freq"))

  /** The seed vocabulary with initial counts: top `vocabSize` pieces
    * under the TOTAL order (freq desc, piece asc) ∪ every single
    * character (always kept — segmentability). (piece, cnt). */
  def seedVocab(cands: DataFrame, vocabSize: Int): DataFrame = {
    val top = cands.orderBy(col("freq").desc, col("piece"))
      .limit(vocabSize)
    top.unionByName(cands.filter(length(col("piece")) === 1))
      .groupBy(col("piece")).agg(max(col("freq")).as("cnt"))
  }

  /** The canonical Viterbi segmentation of `word` under `score`
    * (pieces absent from the map are unusable): maximize the score
    * sum; among maximal paths take the lexicographically smallest
    * space-joined one = shortest piece first at every step. */
  private[ext] def viterbi(word: String, score: collection.Map[String, Long],
      maxPieceLen: Int): Seq[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Long.MinValue)
    best(n) = 0L
    var i = n - 1
    while (i >= 0) {
      var l = 1
      while (l <= math.min(maxPieceLen, n - i)) {
        if (best(i + l) != Long.MinValue) {
          score.get(word.substring(i, i + l)).foreach { s =>
            if (s + best(i + l) > best(i)) best(i) = s + best(i + l)
          }
        }
        l += 1
      }
      i -= 1
    }
    require(best(0) != Long.MinValue,
      s"word '$word' is not segmentable — seed vocabulary must keep " +
        "every single character")
    val out = Seq.newBuilder[String]
    var p = 0
    while (p < n) {
      val l = (1 to math.min(maxPieceLen, n - p)).find { l =>
        best(p + l) != Long.MinValue &&
          score.get(word.substring(p, p + l))
            .exists(s => s + best(p + l) == best(p))
      }.getOrElse(throw new IllegalStateException(
        s"viterbi walk lost the path at $p in '$word'"))
      out += word.substring(p, p + l)
      p += l
    }
    out.result()
  }

  /** The µ-quantized piece scores of one EM round: additive-smoothed
    * unigram log-probs over integer counts — `ln` args are integers,
    * so the oracle reproduces every term exactly (NgramLm precedent). */
  private def scoresOf(counts: Map[String, Long]): Map[String, Long] = {
    val total = counts.values.sum
    val v = counts.size.toLong
    counts.map { case (p, c) =>
      p -> math.floor((math.log(c + 1.0) - math.log((total + v).toDouble))
        * 1000000.0).toLong
    }
  }

  /** Train `rounds` EM iterations; returns the final (piece, n_uses)
    * table — usage counts of every vocabulary piece under the last
    * round's canonical segmentation (zeros kept: an unused piece is a
    * pruning decision the caller can act on). */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    require(vocabSize >= 1 && maxPieceLen >= 1,
      "vocabSize and maxPieceLen must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = Bpe.wordHistogram(docs, textCol).persist()
    try {
      // vocab-bounded driver state (the documented bounded collect):
      // vocabSize + alphabet rows of (piece, count)
      var counts: Map[String, Long] =
        seedVocab(candidates(hist, maxPieceLen), vocabSize)
          .as[(String, Long)].collect().toMap
      (1 to rounds).foreach { _ =>
        val sc = scoresOf(counts)
        val bc = spark.sparkContext.broadcast(sc)
        val uses = hist.as[(String, Long)].mapPartitions { it =>
          it.flatMap { case (w, c) =>
            viterbi(w, bc.value, maxPieceLen).map(p => (p, c))
          }
        }.toDF("piece", "c")
          .groupBy(col("piece")).agg(sum(col("c")).as("n"))
          .as[(String, Long)].collect().toMap
        counts = counts.keys.map(p => p -> uses.getOrElse(p, 0L)).toMap
      }
      counts.toSeq.toDF("piece", "n_uses")
    } finally { hist.unpersist(); () }
  }

  /** The µ-quantized score table of a [[train]]ed piece frame — the
    * bounded collect (vocabSize + alphabet rows) that bridges training
    * output to the [[tokenCounts]] inference face. Scores are exactly
    * one more [[scoresOf]] application, so a SQL replay derives them
    * from the trained counts with the same integer-log formula. */
  def scoreTable(trained: DataFrame): Map[String, Long] = {
    val spark = trained.sparkSession
    import spark.implicits._
    scoresOf(trained.select(col("piece"), col("n_uses").cast("long"))
      .as[(String, Long)].collect().toMap)
  }

  /** Encode words with a TRAINED score table (the inference face):
    * per-doc token counts under the same canonical Viterbi. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      scores: Map[String, Long], maxPieceLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(scores)
    docs.select(col(idCol).cast("long"),
        TextAnalysis.words(col(textCol)).as("ws"))
      .as[(Long, Seq[String])].mapPartitions { it =>
        it.map { case (id, ws) =>
          val n = ws.iterator
            .map(_.replaceAll("[^a-z0-9]", ""))
            .filter(_.nonEmpty)
            .map(w => viterbi(w, bc.value, maxPieceLen).size.toLong)
            .sum
          (id, n)
        }
      }.toDF(idCol, "n_tokens")
  }
}
