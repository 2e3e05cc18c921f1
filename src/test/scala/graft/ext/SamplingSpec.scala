package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 2000L).map { i =>
    (i, if (i % 2 == 0) "en" else "de")
  }.toDF("doc_id", "lang")

  test("stratified keeps ~rate per stratum, deterministically") {
    val out = Sampling.stratified(docs, "doc_id", "lang",
      Map("en" -> 0.25, "de" -> 1.0))
    val byLang = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 1000L) // rate 1.0 keeps everything
    assert(byLang("en") > 150 && byLang("en") < 350) // ~250 of 1000
    // deterministic: same input, same rows
    val again = Sampling.stratified(docs, "doc_id", "lang",
      Map("en" -> 0.25, "de" -> 1.0))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("rate 0 drops the stratum; absent strata keep defaultRate") {
    val out = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 0.0))
    assert(out.filter($"lang" === "en").count() == 0)
    assert(out.filter($"lang" === "de").count() == 1000L) // default 1.0
  }

  test("upsample: whole + fractional copies, 0-factor drops, copy_idx") {
    val out = Sampling.upsample(docs, "doc_id", "lang",
      Map("en" -> 2.5, "de" -> 0.0))
    assert(out.filter($"lang" === "de").count() == 0)
    val en = out.filter($"lang" === "en")
    val n = en.count()
    assert(n > 2000 && n < 3000, s"expected ~2500 rows, got $n") // 2.5×1000
    // every doc appears at least twice (whole part), copy_idx dense from 0
    val perDoc = en.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("copy_idx").as("mx"))
    assert(perDoc.filter($"n" < 2 || $"n" > 3).count() == 0)
    assert(perDoc.filter($"mx" =!= $"n" - 1).count() == 0)
  }

  test("upsample factor below 1 downsamples (single copies)") {
    val out = Sampling.upsample(docs, "doc_id", "lang", Map("en" -> 0.25),
      defaultFactor = 1.0)
    val en = out.filter($"lang" === "en").count()
    assert(en > 150 && en < 350)
    assert(out.filter($"lang" === "de").count() == 1000L)
    // matches stratified at the same rate: SAME hash, same kept set
    val strat = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 0.25))
      .filter($"lang" === "en").select("doc_id").as[Long].collect().sorted
    val up = out.filter($"lang" === "en").select("doc_id")
      .as[Long].collect().sorted
    assert(strat.toSeq == up.toSeq)
  }

  test("tokenBudget: greedy prefix per domain, deterministic, overshoot rule") {
    val df = (1L to 50L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", 10L)).toDF("id", "dom", "toks")
    val out = Sampling.tokenBudget(df, "dom", "id", "toks",
      Map("en" -> 95L, "de" -> 20L))
    val counts = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    // 10-token docs: en keeps while tokens_before < 95 → 10 docs (the
    // tenth starts at 90, overshooting to 100); de: 2 docs (20 not < 20)
    assert(counts == Map("en" -> 10L, "de" -> 2L))
    // kept set = the hash-rank prefix: same ids as fixedSizePerGroup
    val viaRank = Sampling.fixedSizePerGroup(
      df.filter($"dom" === "en"), Seq("dom"), "id", n = 10)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out.filter($"dom" === "en").select("id")
      .as[Long].collect().sorted.toSeq == viaRank)
    // domain not in the budget map → excluded by defaultBudget 0
    assert(!out.filter($"dom" === "fr").collect().nonEmpty)
  }

  test("tokenBudget: budget above the domain total keeps the whole domain") {
    val df = (1L to 6L).map(i => (i, "en", 7L)).toDF("id", "dom", "toks")
    assert(Sampling.tokenBudget(df, "dom", "id", "toks",
      Map("en" -> 1000L)).count() == 6)
  }

  test("fixedSizePerGroup: exact n per group, whole group when smaller") {
    val df = (1L to 100L).map(i => (i, if (i <= 90) "big" else "small"))
      .toDF("id", "grp")
    val out = Sampling.fixedSizePerGroup(df, Seq("grp"), "id", n = 20)
    val counts = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 20L, "small" -> 10L))
    // deterministic: the same 20 ids every run
    val again = Sampling.fixedSizePerGroup(df, Seq("grp"), "id", n = 20)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == out.select("id").as[Long].collect().sorted.toSeq)
  }
}
