package graft.ext

import graft.SparkSpec

class CurationFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stop = Seq("the", "a", "of", "and", "to")
  private val fluent = "the cat sat on the mat and the dog sat on the rug " +
    "a bird flew over the fence to the tree of the garden"

  test("each doc charges exactly one gate; counters chain") {
    val docs = Seq(
      (1L, "en", fluent),                        // survives everything
      (2L, "zh", fluent),                        // gate 1: lang
      (3L, "en", "too short"),                   // gate 2: length
      (4L, "en", fluent + " " + fluent),         // gate 2: length (50 toks > 40)
      (5L, "en", fluent.replace("cat", "cta"))   // survives; near-dup but not exact
    ).toDF("doc_id", "lang", "text")
    val ref = Seq((100L, fluent)).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val rows = CurationFunnel.report(docs, ref, "doc_id", "text", "lang",
      keepLangs = Seq("en"), minTokens = 5L, maxTokens = 40L,
      minQuality = 0.0, stopwords = stop, maxDupFrac = 0.8, maxNll = 100.0)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    assert(rows("lang") == ((5L, 4L, 1L)))       // doc 2 out
    assert(rows("length") == ((4L, 2L, 2L)))     // docs 3 (2 toks) and 4 (50) out
    assert(rows("quality") == ((2L, 2L, 0L)))
    assert(rows("repetition") == ((2L, 2L, 0L)))
    assert(rows("perplexity") == ((2L, 2L, 0L)))
    assert(rows("dedup") == ((2L, 2L, 0L)))
  }

  test("exact duplicates collapse at the dedup gate; min id wins") {
    val docs = Seq(
      (1L, "en", fluent),
      (2L, "en", fluent.toUpperCase),  // same normalized fingerprint
      (3L, "en", fluent + " extra")
    ).toDF("doc_id", "lang", "text")
    val ref = Seq((100L, fluent)).toDF("doc_id", "text")
    val out = CurationFunnel.report(docs, ref, "doc_id", "text", "lang",
      keepLangs = Seq("en"), minTokens = 1L, maxTokens = 1000L,
      minQuality = 0.0, stopwords = stop, maxDupFrac = 1.0, maxNll = 100.0)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    val (in6, kept6, toksDropped) = out("dedup")
    assert(in6 == 3L && kept6 == 2L && toksDropped == 25L, out.toString)
  }

  test("token drop accounting sums to total minus surviving tokens") {
    val docs = Seq(
      (1L, "en", fluent), (2L, "zh", fluent), (3L, "en", "x y z")
    ).toDF("doc_id", "lang", "text")
    val ref = Seq((100L, fluent)).toDF("doc_id", "text")
    val rows = CurationFunnel.report(docs, ref, "doc_id", "text", "lang",
      keepLangs = Seq("en"), minTokens = 5L, maxTokens = 40L,
      minQuality = 0.0, stopwords = stop, maxDupFrac = 1.0, maxNll = 100.0)
      .collect()
    val droppedToks = rows.map(_.getLong(5)).sum
    assert(droppedToks == 25L + 3L, rows.mkString("\n")) // docs 2 and 3
  }
}
