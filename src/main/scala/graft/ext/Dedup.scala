package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, all built on the
  * inverted-index / LSH pattern: NEVER a cross join. Candidate generation
  * shuffles on a small key (shingle, band signature, or bucket), so the
  * cost is O(candidate pairs), not O(n²) — the property that keeps these
  * operators alive at 100 TB.
  */
object Dedup {

  /** Word n-gram shingles, one distinct (id, shingle) row per shingle. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val w = TextAnalysis.words(col(textCol))
    df.select(col(idCol), w.as("w"))
      .select(col(idCol),
        explode(expr(s"transform(sequence(1, greatest(size(w) - ${n - 1}, 0)), " +
          s"i -> concat_ws(' ', slice(w, i, $n)))")).as("shingle"))
      .distinct()
  }

  /** Exact dedup: normalize → hash → keep the smallest id per hash group.
    * One shuffle on the hash; at scale the hash distributes uniformly so
    * there is no skew by construction. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** N-gram Jaccard near-dup pairs via inverted-index join.
    *
    * The shingle→docs inverted index drives CANDIDATE generation only;
    * every candidate pair is then verified with exact Jaccard over the
    * FULL (uncapped) shingle sets, so the reported score is true Jaccard
    * regardless of the cap.
    *
    * @param maxShingleDF drop shingles occurring in more than this many
    *        docs from candidate generation — the standard skew guard,
    *        ON by default: a stop-shingle appearing in 1M docs would
    *        otherwise generate 10¹² candidate pairs on one shuffle key.
    *        A pair is missed only if EVERY shingle it shares exceeds the
    *        cap — at near-dup thresholds shared shingles are pair-specific,
    *        so recall is unaffected in practice. Dropped shingles are
    *        logged (no silent caps). `None` disables the guard.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShingleDF: Option[Long] = Some(1000L)
  ): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val indexed = maxShingleDF match {
      case Some(cap) =>
        val dfCounts = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        val nDropped = dfCounts.filter(col("df") > cap).count()
        if (nDropped > 0) {
          org.slf4j.LoggerFactory.getLogger("graft.ext.Dedup").warn(
            s"ngramJaccardPairs: skew guard dropped $nDropped shingle(s) " +
              s"with document frequency > $cap from candidate generation " +
              "(scores remain exact Jaccard over full shingle sets)")
        }
        sh.join(dfCounts.filter(col("df") <= cap).select(col("shingle")),
          Seq("shingle"), "left_semi")
      case None => sh
    }
    val ca = indexed.select(col(idCol).as("doc_a"), col("shingle"))
    val cb = indexed.select(col(idCol).as("doc_b"), col("shingle"))
    val candidates = ca.join(cb, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()

    // exact verify, candidate-driven (same shape as minhashLshPairs):
    // cost is O(candidates × shingles/doc), skew-free.
    val a = sh.select(col(idCol).as("doc_a"), col("shingle"))
    val b = sh.select(col(idCol).as("doc_b"), col("shingle"))
    val inter = candidates
      .join(a, Seq("doc_a"))
      .join(b, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val jac = col("n_inter").cast("double") /
      (col("n_a") + col("n_b") - col("n_inter"))
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
  }

  /** MinHash signatures as one wide aggregation: column sig_h =
    * `min(md5(h || '|' || shingle))` over the doc's shingle set — md5 as
    * the random permutation proxy, lexicographic min. One shuffle on the
    * doc id, NO 12× row explosion (numHashes aggregate expressions ride a
    * single HashAggregate). Deterministic across engines (and
    * SQL-expressible for the oracle).
    */
  def minhashSignatures(
      sh: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map { h =>
      min(md5(concat(lit(h), lit("|"), col("shingle")))).as(s"sig_$h")
    }
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH near-dup pairs, verified with true Jaccard.
    *
    * Bands of `bandSize` signature rows are hashed; docs sharing any band
    * hash become candidates (one shuffle on the band key); candidates are
    * then verified against the exact shingle-set Jaccard. Recall follows
    * the usual 1-(1-s^r)^b curve; precision is exact post-verify.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 12,
      bandSize: Int = 4,
      threshold: Double = 0.7
  ): DataFrame = {
    // no cache here: the shingle subtree repeats in the plan and Spark's
    // ReuseExchange dedupes its distinct-shuffle; cache ownership (and its
    // memory budget) belongs to the caller at scale.
    val sh = shingles(df, idCol, textCol, shingleN)
    val sigs = minhashSignatures(sh, idCol, numHashes)
    // band signature = md5 of the band's sorted "h:sig" strings (sorted so
    // the value is order-canonical and matches the SQL oracle); bands then
    // unpivot to rows via stack() — pure projection, no extra shuffle
    val nBands = numHashes / bandSize
    val bandCols = (0 until nBands).map { b =>
      val items = (b * bandSize until (b + 1) * bandSize).map { h =>
        concat_ws(":", lit(h), col(s"sig_$h"))
      }
      md5(concat_ws("|", array_sort(array(items: _*)))).as(s"bsig_$b")
    }
    val stackArgs = (0 until nBands).map(b => s"$b, bsig_$b").mkString(", ")
    val bandsDet = sigs
      .select(col(idCol) +: bandCols: _*)
      .select(col(idCol),
        expr(s"stack($nBands, $stackArgs) AS (band, band_sig)"))

    val ca = bandsDet.select(col(idCol).as("doc_a"), col("band"), col("band_sig"))
    val cb = bandsDet.select(col(idCol).as("doc_b"), col("band"), col("band_sig"))
    val candidates = ca.join(cb, Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()

    // verify candidates with exact jaccard — drive the intersection FROM
    // the candidate set (small) instead of exploding all shingle-sharing
    // pairs first: candidates ⋈ shingles(doc_a) ⋈ shingles(doc_b, same
    // shingle). Cost is O(candidate pairs × shingles/doc), independent of
    // the corpus-wide shingle collision count.
    val a = sh.select(col(idCol).as("doc_a"), col("shingle"))
    val b = sh.select(col(idCol).as("doc_b"), col("shingle"))
    val inter = candidates
      .join(a, Seq("doc_a"))
      .join(b, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val jac = col("n_inter").cast("double") /
      (col("n_a") + col("n_b") - col("n_inter"))
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
  }

  /** 32-bit SimHash per document, occurrence-weighted.
    *
    * Bit source: the first 8 hex chars of md5(word), 4 bits per char —
    * deterministic across engines. Fingerprint bit j is set iff the
    * ±1 vote sum over all word occurrences is positive.
    * Returned as a bigint in [0, 2³²).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withWords = df
      .select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("word"))
      .withColumn("hh", substring(md5(col("word")), 1, 8))
    val bits = withWords
      .select(col(idCol), col("hh"), explode(expr("sequence(0, 31)")).as("j"))
      .withColumn("nib",
        expr("instr('0123456789abcdef', substring(hh, 1 + CAST(j / 4 AS INT), 1)) - 1"))
      .withColumn("bit", expr("(nib >> (3 - j % 4)) & 1"))
      .withColumn("vote", when(col("bit") === 1, 1).otherwise(-1))
    bits.groupBy(col(idCol), col("j"))
      .agg(sum(col("vote")).as("v"))
      .groupBy(col(idCol))
      .agg(sum(when(col("v") > 0, expr("CAST(pow(2, j) AS BIGINT)")).otherwise(0L))
        .as("simhash"))
  }

  /** SimHash near-dup pairs: band the 32-bit fingerprint into four 8-bit
    * chunks; docs sharing ANY chunk become candidates (pigeonhole: every
    * pair within hamming distance 3 shares at least one of 4 bands);
    * verify with exact `bit_count(a^b)`. One shuffle on the (band, value)
    * key — no cross join, the same LSH posture as minhash banding.
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = simhash(df, idCol, textCol)
    val bands = fp.select(col(idCol), col("simhash"),
        explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("chunk", expr("shiftright(simhash, CAST(b * 8 AS INT)) & 255"))
    val ca = bands.select(col(idCol).as("doc_a"), col("simhash").as("sh_a"),
      col("b"), col("chunk"))
    val cb = bands.select(col(idCol).as("doc_b"), col("simhash").as("sh_b"),
      col("b"), col("chunk"))
    ca.join(cb, Seq("b", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Near-dup pairs by embedding cosine within sign-bucket (see
    * [[Similarity.signBucket]]): approximate recall, exact scores. */
  def embeddingCosinePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bucketBits: Int = 8): DataFrame = {
    val withB = df.select(col(idCol), col(vecCol).as("v"))
      .withColumn("bucket", Similarity.signBucket(col("v"), bucketBits))
      .withColumn("n", sqrt(Similarity.dot(col("v"), col("v"))))
    val a = withB.select(col("bucket"), col(idCol).as("doc_a"),
      col("v").as("va"), col("n").as("na"))
    val b = withB.select(col("bucket"), col(idCol).as("doc_b"),
      col("v").as("vb"), col("n").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("cos",
        Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("cos"), 4).as("cosine"))
  }
}
