package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a shared run at the guarantee length is always paired") {
    // spanTokens=4, winnowWindow=3 → guarantee length 4+3-1=6 tokens
    val shared = words("s", 6)
    val docs = Seq(
      (1L, words("a", 5) + " " + shared + " " + words("b", 4)),
      (2L, words("c", 9) + " " + shared),
      (3L, words("d", 20)) // no overlap
    ).toDF("doc_id", "text")
    val pairs = SpanDedup.sharedSpanPairs(docs, "doc_id", "text",
      spanTokens = 4, winnowWindow = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("winnowing never misses vs brute-force at the guarantee length") {
    // seeded random docs over a tiny vocabulary (lots of accidental
    // n-gram repeats) — every brute-force shared-span pair at
    // >= spanTokens + winnowWindow - 1 tokens must also be winnowed-found
    val rnd = new scala.util.Random(7)
    val vocab = Vector("x", "y", "z", "w")
    val docs = (1L to 30L).map { id =>
      (id, (1 to 40).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val spanTokens = 5
    val winnowWindow = 3
    val guarantee = spanTokens + winnowWindow - 1 // 7

    def grams(n: Int) = docs.select(col("doc_id"),
      explode(expr(s"transform(sequence(1, size(split(text, ' ')) - ${n - 1}), " +
        s"i -> concat_ws(' ', slice(split(text, ' '), i, $n)))")).as("g"))
      .distinct()
    val brute = grams(guarantee).as("x")
      .join(grams(guarantee).as("y"), Seq("g"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"))
      .as[(Long, Long)].collect().toSet
    val winnowed = SpanDedup.sharedSpanPairs(docs, "doc_id", "text",
      spanTokens, winnowWindow)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture produced no shared spans — weaken vocab")
    assert(brute.subsetOf(winnowed),
      s"missed pairs: ${brute.diff(winnowed)}")
    // and nothing below spanTokens can pair: every found pair must share
    // at least one exact spanTokens-gram
    val minShared = grams(spanTokens).as("x")
      .join(grams(spanTokens).as("y"), Seq("g"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(winnowed.subsetOf(minShared))
  }

  test("maxFingerprintDF drops boilerplate posting lists with an audit") {
    val boiler = words("lic", 8) // exact 8-token license block
    val docs = ((1L to 6L).map(id => (id, boiler)) :+
      (7L, words("u", 8)) :+ (8L, words("u", 8))).toDF("doc_id", "text")
    val capped = SpanDedup.sharedSpanPairs(docs, "doc_id", "text",
      spanTokens = 8, winnowWindow = 2, maxFingerprintDF = Some(3))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((7L, 8L))) // the 6-doc boilerplate clique capped out
    val uncapped = SpanDedup.sharedSpanPairs(docs, "doc_id", "text",
      spanTokens = 8, winnowWindow = 2)
    assert(uncapped.count() == 15 + 1) // C(6,2) + the (7,8) pair
  }

  test("incremental indexing: new batch vs persisted index == cross-batch pairs") {
    // fingerprints are doc-local, so a persisted fingerprint table serves
    // incremental arrival: joining only the NEW batch's fingerprints
    // against the stored index must find exactly the cross-batch pairs a
    // full recompute over the union would
    val shared = words("s", 9)
    val batch1 = Seq(
      (1L, words("a", 6) + " " + shared),
      (2L, words("b", 20))).toDF("doc_id", "text")
    val batch2 = Seq(
      (11L, shared + " " + words("c", 5)),
      (12L, words("b", 20)), // exact dup of doc 2 across batches
      (13L, words("d", 15))).toDF("doc_id", "text")

    val full = SpanDedup.sharedSpanPairs(batch1.union(batch2),
      "doc_id", "text", spanTokens = 5, winnowWindow = 3)
      .filter((col("doc_a") <= 2 && col("doc_b") >= 11) ||
        (col("doc_a") >= 11 && col("doc_b") <= 2))
      .select("doc_a", "doc_b", "n_shared")
      .as[(Long, Long, Long)].collect().toSet

    val index = SpanDedup.fingerprints(batch1, "doc_id", "text", 5, 3)
    val fresh = SpanDedup.fingerprints(batch2, "doc_id", "text", 5, 3)
    val incremental = index.select(col("doc_id").as("doc_a"), col("fp"))
      .join(fresh.select(col("doc_id").as("doc_b"), col("fp")), Seq("fp"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .as[(Long, Long, Long)].collect().toSet

    assert(full.nonEmpty && incremental == full)
  }

  test("nulls, empties, and short docs yield no fingerprints") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "),
      (4L, "one two three")).toDF("doc_id", "text")
    assert(SpanDedup.fingerprints(docs, "doc_id", "text",
      spanTokens = 4, winnowWindow = 2).count() == 0)
  }
}
