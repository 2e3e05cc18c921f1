package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val banner = "cookie notice applies here ok"

  test("boilerplate segments are dropped, unique text kept in order") {
    // width-5 segments: docs 1 and 2 share the banner as their first
    // segment; their tails differ. doc 3 is all-unique.
    val docs = Seq(
      (1L, s"$banner alpha beta gamma delta eps"),
      (2L, s"$banner zeta eta theta iota kappa"),
      (3L, "solo words that nobody else repeats anywhere at all now")
    ).toDF("doc_id", "text")

    val out = Boilerplate.scrub(docs, "doc_id", "text", width = 5,
      minDocs = 2).orderBy("doc_id").collect()

    assert(out(0) === Row(1L, 2L, 1L, "alpha beta gamma delta eps"))
    assert(out(1) === Row(2L, 2L, 1L, "zeta eta theta iota kappa"))
    assert(out(2) === Row(3L, 2L, 2L,
      "solo words that nobody else repeats anywhere at all now"))
  }

  test("all-boilerplate document survives with empty clean_text") {
    val docs = Seq((1L, banner), (2L, banner), (3L, banner))
      .toDF("doc_id", "text")
    val out = Boilerplate.scrub(docs, "doc_id", "text", 5, 2)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    assert(out.forall(r => r.getLong(1) == 1L && r.getLong(2) == 0L &&
      r.getString(3) == ""))
  }

  test("df counts DISTINCT documents, not occurrences") {
    // the banner repeats twice inside doc 1 but appears in only one
    // document — below minDocs = 2, so it must be kept.
    val docs = Seq((1L, s"$banner $banner")).toDF("doc_id", "text")
    val out = Boilerplate.scrub(docs, "doc_id", "text", 5, 2).collect()
    assert(out.head === Row(1L, 2L, 2L, s"$banner $banner"))
  }

  test("short final segment participates like any other") {
    val docs = Seq(
      (1L, "one two three four five tail"),
      (2L, "unrelated words entirely different from tail")
    ).toDF("doc_id", "text")
    // "tail" is each doc's final short segment → df 2 → boilerplate.
    val out = Boilerplate.scrub(docs, "doc_id", "text", 5, 2)
      .orderBy("doc_id").collect()
    assert(out(0) === Row(1L, 2L, 1L, "one two three four five"))
    assert(out(1) === Row(2L, 2L, 1L,
      "unrelated words entirely different from"))
  }

  test("boilerplate membership join is a broadcast") {
    val docs = Seq((1L, banner), (2L, banner)).toDF("doc_id", "text")
    val plan = Boilerplate.scrub(docs, "doc_id", "text", 5, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"expected broadcast join:\n$plan")
  }
}
