package graft.ext

import scala.collection.mutable

import graft.SparkSpec

/** Contracts for distributed BPE training: equality with an independent
  * in-memory reference implementation (plain loops, no Spark), the
  * classic hand-checkable corpus, greedy left-to-right application
  * semantics (the overlap case), and total-order tie-breaking.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ── independent reference implementation (Sennrich-style) ──────────
  private def applyGreedy(sym: Vector[String], l: String,
      r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < sym.size) {
      if (i + 1 < sym.size && sym(i) == l && sym(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += sym(i); i += 1 }
    }
    b.result()
  }

  private def refLearn(words: Seq[(String, Long)],
      rounds: Int): Seq[Bpe.Merge] = {
    var vocab = words.map { case (w, c) =>
      (w.map(_.toString).toVector, c)
    }
    val out = mutable.Buffer.empty[Bpe.Merge]
    var rank = 1
    var stop = false
    while (rank <= rounds && !stop) {
      val counts = mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (sym, c) =>
        (0 until sym.size - 1).foreach { i =>
          val k = (sym(i), sym(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += Bpe.Merge(rank, l, r, c)
        vocab = vocab.map { case (sym, cc) => (applyGreedy(sym, l, r), cc) }
        rank += 1
      }
    }
    out.toSeq
  }

  private def docsOf(words: Seq[(String, Long)]) = {
    // spread each word's copies across several documents so training
    // sees a multi-row corpus, not one giant line
    val flat = words.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
    flat.grouped(7).map(_.mkString(" ")).toSeq.toDF("text")
  }

  test("classic corpus: first merge is (e,s) — tie with (s,t) broken lexicographically") {
    val words = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val merges = Bpe.learn(docsOf(words), "text", rounds = 1)
    // (e,s) and (s,t) both count 9; total order picks (e,s)
    assert(merges == Seq(Bpe.Merge(1, "e", "s", 9L)))
  }

  test("10 rounds equal the in-memory reference on a random corpus") {
    val rnd = new scala.util.Random(42)
    val words = (1 to 60).map { _ =>
      val len = 1 + rnd.nextInt(8)
      val w = (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      w -> (1L + rnd.nextInt(20))
    }.groupBy(_._1).map { case (w, vs) => w -> vs.map(_._2).sum }.toSeq
    val expected = refLearn(words, 10)
    val got = Bpe.learn(docsOf(words).repartition(5), "text", rounds = 10)
    assert(got == expected)
  }

  test("greedy overlap: aaaa merges to [aa][aa], aaa to [aa][a]") {
    val merges = Bpe.learn(Seq("aaaa").toDF("text"), "text", rounds = 2)
    // round 1: (a,a) appears 3 times in (a)(a)(a)(a); applied greedily
    // -> (aa)(aa); round 2: (aa,aa) once
    assert(merges == Seq(Bpe.Merge(1, "a", "a", 3L),
      Bpe.Merge(2, "aa", "aa", 1L)))
    val enc = Seq("aaaa", "aaa").toDF("w")
      .select(Bpe.encodeWith(org.apache.spark.sql.functions.col("w"),
        Seq("a" -> "a")).as("enc"))
      .as[String].collect().toSeq
    assert(enc == Seq("(aa)(aa)", "(aa)(a)"))
  }

  test("learning stops early when every word is fully fused") {
    // 'ab' needs exactly one merge; further rounds have no pairs
    val merges = Bpe.learn(Seq("ab ab ab").toDF("text"), "text", rounds = 5)
    assert(merges == Seq(Bpe.Merge(1, "a", "b", 3L)))
  }

  test("encode with no merges is character tokenization; token count matches") {
    val df = Seq("hello").toDF("w")
    val enc = df.select(Bpe.encodeWith(
      org.apache.spark.sql.functions.col("w"), Nil).as("enc"))
    assert(enc.as[String].head() == "(h)(e)(l)(l)(o)")
    assert(enc.select(Bpe.tokenCountOf(
      org.apache.spark.sql.functions.col("enc")).cast("long").as("n"))
      .as[Long].head() == 5L)
  }

  test("word histogram strips to [a-z0-9] (delimiter-safety precondition)") {
    val hist = Bpe.wordHistogram(
      Seq("(a)b! (a)b! c-d").toDF("text"), "text")
      .as[(String, Long)].collect().toMap
    assert(hist == Map("ab" -> 2L, "cd" -> 1L))
  }
}
