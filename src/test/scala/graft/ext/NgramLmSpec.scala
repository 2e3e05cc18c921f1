package graft.ext

import graft.SparkSpec

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private val reference = Seq(
    (100L, "the cat sat on the mat"),
    (101L, "the dog sat on the rug"),
    (102L, "a cat and a dog sat")).toDF("doc_id", "text")

  test("reference-like text scores lower NLL than shuffled gibberish") {
    val docs = Seq(
      (1L, "the cat sat on the rug"),       // fluent, in-vocab
      (2L, "rug the on sat cat the"),       // same tokens, broken order
      (3L, "zyx qqq wvu zzz ppp nnn")       // out-of-vocab noise
    ).toDF("doc_id", "text")
    val nll = NgramLm.perplexity(docs, reference, "doc_id", "text")
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    // fluent in-vocab text beats both degradations; order between the
    // two degradations is smoothing-dependent at toy vocab size (add-one
    // penalizes unseen bigrams MORE under seen conditioning words)
    assert(nll(1L) < nll(2L) && nll(1L) < nll(3L), nll.toString)
  }

  test("exact sums are run-deterministic; n_tokens = word count") {
    val docs = Seq((1L, "the cat sat"), (2L, "dog")).toDF("doc_id", "text")
    val a = NgramLm.perplexity(docs, reference, "doc_id", "text")
      .select("doc_id", "n_tokens", "sq").as[(Long, Long, Long)]
      .collect().toSet
    val b = NgramLm.perplexity(docs, reference, "doc_id", "text")
      .select("doc_id", "n_tokens", "sq").as[(Long, Long, Long)]
      .collect().toSet
    assert(a == b)
    assert(a.map(r => r._1 -> r._2).toMap == Map(1L -> 3L, 2L -> 1L))
  }

  test("wordless docs emit no row; single-token doc uses the unigram model") {
    val docs = Seq((1L, "   "), (2L, "the")).toDF("doc_id", "text")
    val rows = NgramLm.perplexity(docs, reference, "doc_id", "text")
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    assert(rows.keySet == Set(2L))
    // p(the) = (c+1)/(N+V): c=4, N=18, V=9 -> -ln(5/27)
    assert(math.abs(rows(2L) - (-math.log(5.0 / 27.0))) < 1e-3, rows.toString)
  }
}
