package graft.ext

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    Repetition.stats(rows.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Double, Option[String], Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("repeated phrase dominates both signals") {
    // "buy now buy now buy now": 6 words, 2 distinct -> dup 4/6 = 0.6667
    // bigrams: "buy now"x3, "now buy"x2 -> top frac 3/5 = 0.6
    val out = run(1L -> "buy now buy now buy now")
    assert(out(1L) == ((0.6667, Some("buy now"), 0.6)))
  }

  test("all-distinct prose scores zero duplication") {
    val out = run(2L -> "the quick brown fox")
    assert(out(2L)._1 == 0.0)
    assert(out(2L)._3 == ((1.0 / 3 * 10000).round / 10000.0)) // every bigram unique: 1/3
  }

  test("bigram ties break lexicographically") {
    // "b a b" -> bigrams "b a", "a b" each once; tie -> "a b"
    val out = run(3L -> "b a b")
    assert(out(3L)._2 == Some("a b"))
  }

  test("single-word and empty documents keep a row with zero fractions") {
    val out = run(4L -> "hello", 5L -> "   ")
    assert(out(4L) == ((0.0, None, 0.0)))
    assert(out(5L)._2 == None)
    assert(out(5L)._3 == 0.0)
  }
}
