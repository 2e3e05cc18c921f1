package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "der die das und der die"),
    (3L, "  spaced   out   text  "),
    (4L, "one")
  ).toDF("doc_id", "text")

  test("tokenCount handles repeated/leading whitespace") {
    val m = docs.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(m(1L) == 9)
    assert(m(3L) == 3)
    assert(m(4L) == 1)
  }

  test("bpeish tokens split letters runs / digits / symbols") {
    val n = Seq((1L, "abc12 x-y!")).toDF("doc_id", "text")
      .select(TextAnalysis.bpeishTokenCount($"text")).as[Int].head()
    // abc, 1, 2, x, -, y, ! → 7
    assert(n == 7)
  }

  test("languageId votes markers, tie → lexicographic first") {
    val markers = Seq("de" -> Seq("der", "die"), "en" -> Seq("the", "a"))
    val out = docs.select($"doc_id",
      TextAnalysis.languageId($"text", markers).as("l")).as[(Long, String)]
      .collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(4L) == "de") // 0-0 tie → lexicographic first
  }

  test("fingerprint invariant to case and whitespace runs") {
    val fps = Seq((1L, "Hello  World"), (2L, "hello world "))
      .toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("qualityScore in [0,1] and penalizes punctuation soup") {
    val q = Seq((1L, "the cat sat on the mat with a hat and a bat"),
                (2L, "!!!.,;: ??!"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.qualityScore($"text", Seq("the", "a")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(q(1L) > q(2L))
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("entropy: 0 for degenerate repetition, log2(n) for all-unique") {
    val df = Seq(
      (1L, "x x x x"),         // H = 0
      (2L, "a a b b"),         // counts 2,2 of n=4 → H = 1
      (3L, "a b c d"),         // all unique → H = log2(4) = 2
      (4L, "")                 // no words → no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.entropy(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((4L, 0.0)))
    assert(out(2L) == ((4L, 1.0)))
    assert(out(3L) == ((4L, 2.0)))
    assert(!out.contains(4L))
  }
}
