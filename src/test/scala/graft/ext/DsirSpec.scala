package graft.ext

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target: short science-y docs; raw: mostly boilerplate + two docs that
  // echo the target vocabulary (those must out-score the boilerplate)
  private val target = Seq(
    (100L, "quantum field theory predicts particle interactions"),
    (101L, "field equations govern quantum particle states"),
    (102L, "particle physics theory quantum measurements"))
  private val rawSciA = (1L, "quantum particle theory lecture notes field")
  private val rawSciB = (2L, "field theory of quantum measurements")
  private val rawBoiler = Seq(
    (3L, "click here subscribe newsletter cookie policy accept"),
    (4L, "terms of service privacy policy contact us footer"),
    (5L, "click subscribe accept cookie policy terms footer"))

  private def frames = (
    (Seq(rawSciA, rawSciB) ++ rawBoiler).toDF("doc_id", "text"),
    target.toDF("doc_id", "text"))

  test("target-like docs out-score boilerplate; weights are deterministic") {
    val (raw, tgt) = frames
    val w1 = Dsir.weights(raw, tgt, "doc_id", "text")
      .select("doc_id", "sq").as[(Long, Long)].collect().toMap
    val w2 = Dsir.weights(raw, tgt, "doc_id", "text")
      .select("doc_id", "sq").as[(Long, Long)].collect().toMap
    assert(w1 == w2) // exact BIGINT sums: bit-identical across runs
    assert(Seq(1L, 2L).map(w1).min > Seq(3L, 4L, 5L).map(w1).max,
      s"science docs must beat boilerplate: $w1")
  }

  test("selectTopK keeps exactly k, ordered by weight then id") {
    val (raw, tgt) = frames
    val top = Dsir.selectTopK(raw, tgt, "doc_id", "text", k = 2)
      .select("doc_id").as[Long].collect().toVector
    assert(top.size == 2 && top.toSet == Set(1L, 2L), top.toString)
  }

  test("no-word and null docs emit no row; n_feat counts grams") {
    val (_, tgt) = frames
    val raw = Seq((1L, Option("a b c")), (2L, Option("   ")),
      (3L, Option.empty[String])).toDF("doc_id", "text")
    val w = Dsir.weights(raw, tgt, "doc_id", "text")
      .select("doc_id", "n_feat").as[(Long, Long)].collect().toMap
    assert(w == Map(1L -> 5L)) // 3 unigrams + 2 bigrams
  }

  test("plan: bucket-distribution joins broadcast, never sort-merge") {
    val (raw, tgt) = frames
    val q = Dsir.weights(raw, tgt, "doc_id", "text")
    q.collect() // finalize AQE
    val p = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(600))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(600))
  }
}
