package graft.ext

import graft.SparkSpec

/** Unigram-LM training contracts: the Viterbi walk returns THE
  * canonical segmentation (max score, then lexicographically smallest
  * space-joined path — verified against full enumeration), and train()
  * equals an independent plain-Scala EM reference end to end. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // ── independent reference: enumerate EVERY segmentation ────────────
  private def allSegs(w: String, vocab: Set[String],
      maxLen: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(maxLen, w.length)).flatMap { l =>
      val p = w.take(l)
      if (vocab(p)) allSegs(w.drop(l), vocab, maxLen).map(p +: _)
      else Seq.empty
    }

  private def refCanonical(w: String, scores: Map[String, Long],
      maxLen: Int): Seq[String] =
    allSegs(w, scores.keySet, maxLen)
      .map(seg => (seg.map(scores).sum, seg))
      .sortBy { case (s, seg) => (-s, seg.mkString(" ")) }
      .head._2

  private def refTrain(docs: Seq[String], vocabSize: Int, maxLen: Int,
      rounds: Int): Map[String, Long] = {
    val words = docs.flatMap(_.trim.toLowerCase.split("\\s+"))
      .map(_.replaceAll("[^a-z0-9]", "")).filter(_.nonEmpty)
    val hist = words.groupBy(identity).map { case (w, o) =>
      w -> o.size.toLong }
    val cand = hist.toSeq.flatMap { case (w, c) =>
      for {
        l <- 1 to maxLen
        i <- 0 to w.length - l
      } yield (w.substring(i, i + l), c)
    }.groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
    val top = cand.toSeq.sortBy { case (p, f) => (-f, p) }
      .take(vocabSize).map(_._1).toSet
    val vocab = top ++ cand.keys.filter(_.length == 1)
    var counts: Map[String, Long] = vocab.map(p => p -> cand(p)).toMap
    (1 to rounds).foreach { _ =>
      val total = counts.values.sum
      val v = counts.size.toLong
      val sc = counts.map { case (p, c) =>
        p -> math.floor((math.log(c + 1.0) -
          math.log((total + v).toDouble)) * 1000000.0).toLong
      }
      val uses = hist.toSeq.flatMap { case (w, c) =>
        refCanonical(w, sc, maxLen).map(p => (p, c))
      }.groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
      counts = counts.keys.map(p => p -> uses.getOrElse(p, 0L)).toMap
    }
    counts
  }

  test("viterbi: max score wins; ties take the lexicographically " +
      "smallest path (= shortest piece first)") {
    // 'abc': {a, b, c, ab, bc, abc}; scores make ab+c tie a+bc
    val sc = Map("a" -> -10L, "b" -> -10L, "c" -> -10L,
      "ab" -> -15L, "bc" -> -15L, "abc" -> -40L)
    // a+bc = ab+c = −25 > a+b+c = −30 > abc = −40; canonical = 'a bc'
    assert(UnigramLm.viterbi("abc", sc, 3) == Seq("a", "bc"))
    assert(refCanonical("abc", sc, 3) == Seq("a", "bc"))
    // make the fused piece win outright
    val sc2 = sc + ("abc" -> -5L)
    assert(UnigramLm.viterbi("abc", sc2, 3) == Seq("abc"))
    assert(refCanonical("abc", sc2, 3) == Seq("abc"))
  }

  test("viterbi ≡ enumeration reference on randomized vocabularies") {
    val rnd = new scala.util.Random(83)
    val alphabet = "abcd"
    (1 to 30).foreach { trial =>
      val w = Vector.fill(6 + rnd.nextInt(4))(
        alphabet(rnd.nextInt(4))).mkString
      // random multi-char pieces + all single chars (segmentability)
      val multi = Vector.fill(5) {
        val start = rnd.nextInt(w.length - 1)
        val len = 2 + rnd.nextInt(math.min(3, w.length - start - 1))
        w.substring(start, start + len)
      }
      val vocab = (alphabet.map(_.toString) ++ multi).distinct
      val sc = vocab.map(p => p -> (-(rnd.nextInt(5) + 1) * 7L)).toMap
      assert(UnigramLm.viterbi(w, sc, 4) == refCanonical(w, sc, 4),
        s"trial $trial: word $w vocab $sc")
    }
  }

  test("train ≡ the independent EM reference, zeros kept") {
    // 'a' and 'is' are SHORTER than maxPieceLen: a descending-sequence
    // candidate generator would mint truncated pieces off them and
    // skew the seed vocabulary (caught by the sf gate, now pinned)
    val docs = Seq(
      "spark spark table scan a",
      "sparkly table scan scan is",
      "spark table a is a",
      "scanner sparkle")
    val out = UnigramLm.train(docs.toDF("text"), "text",
      vocabSize = 12, maxPieceLen = 3, rounds = 2)
      .as[(String, Long)].collect().toMap
    val ref = refTrain(docs, vocabSize = 12, maxLen = 3, rounds = 2)
    assert(out == ref)
    assert(out.values.exists(_ == 0L),
      "fixture should leave at least one pruning-candidate piece unused")
  }

  test("tokenCounts: the inference face segments with the same " +
      "canonical rule") {
    val sc = Map("s" -> -10L, "p" -> -10L, "a" -> -10L, "r" -> -10L,
      "k" -> -10L, "spark" -> -12L, "sp" -> -11L, "ar" -> -11L)
    val out = UnigramLm.tokenCounts(
      Seq((1L, "spark Spark!"), (2L, "sp ark")).toDF("doc_id", "text"),
      "doc_id", "text", sc, maxPieceLen = 5)
      .as[(Long, Long)].collect().toMap
    // 'spark' → one piece (−12 beats sp+ar+k = −32); doc 2: 'sp'=1,
    // 'ark' → ar+k = 2
    assert(out == Map(1L -> 2L, 2L -> 3L))
  }
}
