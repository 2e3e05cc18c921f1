package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level prefix sums: bit-identical to the single-window form on
  * every row, at several shard counts (including shards=1 and shards >
  * distinct hashes), plus the PLAN CONTRACT — the window over the big
  * input must be partitioned by (group, shard), never group alone. */
class PrefixSumsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 500L)
    .map(i => (i, if (i % 10 == 0) "de" else "en", (i % 37) + 1))
    .toDF("id", "lang", "toks")

  private def reference = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(Splits.hashBucket(col("id"), nibbles = 8), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    corpus.withColumn("tokens_before",
      coalesce(sum(col("toks")).over(w), lit(0L)))
  }

  test("equals the single-window exclusive sum at shards 1/4/64/65536") {
    val exp = reference.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    for (s <- Seq(1, 4, 64, 65536)) {
      val got = PrefixSums.hashOrderedExclusiveSum(corpus, Seq("lang"),
          "id", "toks", Nil, "tokens_before", shards = s)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got === exp, s"shards=$s")
    }
  }

  test("tie columns break equal-rank rows exactly like the window form") {
    // duplicate every id (copy_idx 0/1): same md5 rank, tie on copy_idx
    val dup = corpus.withColumn("copy_idx", explode(array(lit(0L), lit(1L))))
    val w = Window.partitionBy(col("lang"))
      .orderBy(Splits.hashBucket(col("id"), nibbles = 8), col("id"),
        col("copy_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val exp = dup.withColumn("pre",
        coalesce(sum(col("toks")).over(w), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(4)).toMap
    val got = PrefixSums.hashOrderedExclusiveSum(dup, Seq("lang"), "id",
        "toks", Seq("copy_idx"), "pre", shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(4)).toMap
    assert(got === exp)
  }

  test("plan contract: the big-side window is sharded, not per-group") {
    val plan = PrefixSums.hashOrderedExclusiveSum(corpus, Seq("lang"),
        "id", "toks", Nil, "tokens_before")
      .queryExecution.executedPlan.toString
    // both Window nodes carry __shard: the offset window partitions the
    // subtotal table by lang but ORDERS by __shard; the big window
    // PARTITIONS by (lang, __shard) — so every Window line mentions it
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty)
    assert(windows.forall(_.contains("__shard")),
      s"unsharded window in plan:\n$plan")
    // and the shard offsets come back via a broadcast join, not a shuffle
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("column order and schema are preserved; first row of each group is 0") {
    val out = PrefixSums.hashOrderedExclusiveSum(corpus, Seq("lang"),
      "id", "toks", Nil, "pre", shards = 16)
    assert(out.columns.toSeq === Seq("id", "lang", "toks", "pre"))
    val firsts = out.orderBy(Splits.hashBucket(col("id"), nibbles = 8))
      .groupBy("lang").agg(min("pre").as("m")).collect()
    assert(firsts.forall(_.getLong(1) == 0L))
  }

  test("rejects non-power-of-two and out-of-range shard counts") {
    for (bad <- Seq(0, 3, 48, 131072))
      intercept[IllegalArgumentException] {
        PrefixSums.hashOrderedExclusiveSum(corpus, Seq("lang"), "id",
          "toks", Nil, "pre", shards = bad)
      }
  }
}
