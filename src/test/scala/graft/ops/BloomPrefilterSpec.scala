package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exactness and shape contracts for the Bloom-prefiltered joins: the
  * residual join must erase every false positive (semi ≡ plain semi,
  * anti ≡ plain anti) even under a deliberately UNDERSIZED filter whose
  * fpp is enormous; null keys follow join semantics; string keys probe
  * the same hash the builder wrote; and the prefilter actually prunes
  * (the codegen probe rejects definite misses).
  */
class BloomPrefilterSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (1L to 2000L).map(i => (i, s"row$i"))
    .toDF("k", "payload")
  private def keys = (1L to 2000L).filter(_ % 7 == 0).map(Tuple1(_))
    .toDF("key")

  test("semi ≡ plain semi, including under an undersized (high-fpp) filter") {
    val plain = fact.join(keys.withColumnRenamed("key", "k2"),
      $"k" === $"k2", "left_semi").select($"k").as[Long].collect().sorted
    for (expected <- Seq(1000000L, 10L)) { // honest and badly undersized
      val got = BloomPrefilter.semiJoin(fact, "k", keys, "key",
        expectedKeys = expected, fpp = 0.03)
        .select($"k").as[Long].collect().sorted
      assert(got.toSeq == plain.toSeq, s"expectedKeys=$expected")
    }
  }

  test("anti ≡ plain anti; null fact keys are kept, null-free output matches") {
    val factN = fact.select(
      when($"k" % 13 === 0, lit(null).cast("long")).otherwise($"k").as("k"),
      $"payload")
    val plain = factN.join(keys.withColumnRenamed("key", "k2"),
      $"k" === $"k2", "left_anti")
      .select($"payload").as[String].collect().sorted
    for (expected <- Seq(1000000L, 10L)) {
      val got = BloomPrefilter.antiJoin(factN, "k", keys, "key",
        expectedKeys = expected, fpp = 0.03)
        .select($"payload").as[String].collect().sorted
      assert(got.toSeq == plain.toSeq, s"expectedKeys=$expected")
    }
  }

  test("semi drops null fact keys (IN semantics)") {
    val factN = Seq(Some(7L), None, Some(8L)).toDF("k")
    val got = BloomPrefilter.semiJoin(factN, "k", keys, "key", 100L)
      .as[Long].collect().toSeq
    assert(got == Seq(7L))
  }

  test("string keys: probe hash matches the builder's putString") {
    val sFact = (1 to 500).map(i => s"doc-$i").toDF("id")
    val sKeys = (1 to 500).filter(_ % 9 == 0).map(i => s"doc-$i").toDF("id")
    val plain = sFact.join(sKeys.withColumnRenamed("id", "id2"),
      $"id" === $"id2", "left_semi").as[String].collect().sorted
    val got = BloomPrefilter.semiJoin(sFact, "id", sKeys, "id", 1000L)
      .as[String].collect().sorted
    assert(got.toSeq == plain.toSeq)
  }

  test("the prefilter prunes: definite misses never reach the residual join") {
    // probe the expression directly: every true key must pass, and at
    // 1% fpp the 1714 non-keys must be mostly rejected map-side
    graft.functions.BloomMightContain.register(spark)
    val bf = keys.stat.bloomFilter("key", 1000L, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val pre = fact.filter(
      call_function("bloom_might_contain", lit(bos.toByteArray), $"k"))
    val kept = pre.as[(Long, String)].collect().map(_._1).toSet
    val trueKeys = (1L to 2000L).filter(_ % 7 == 0).toSet
    assert(trueKeys.subsetOf(kept), "a true key was rejected — never legal")
    val fps = kept.size - trueKeys.size
    assert(fps <= 60, s"fpp far above target: $fps false positives of 1714")
  }
}
