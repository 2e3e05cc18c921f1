package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain

/** Bloom-prefiltered semi/anti joins — the runtime-filter pattern as an
  * explicit operator, for the key-set size Spark's planner has no answer
  * to: a filter/blocklist too LARGE to broadcast-hash-join (100 M keys ≈
  * gigabytes as a hash table) but whose Bloom filter fits comfortably
  * (~1.2 MB per million keys at 1 % fpp). The 100 TB use cases are the
  * training-pipeline staples: keep only documents on an allowlist,
  * drop everything on a contamination blocklist.
  *
  * Reference surface being extended: the J5 availability semi join
  * (`lambda/etl_aws/neptune_etl_aws.py:1513-1518`) and the A14/K9
  * anti-join GC (`:1932-2066`) — both membership filters whose key sets
  * fit memory in the reference's single-node world; this operator is
  * the same semantics at the scale where they no longer do.
  *
  * Shape: build the filter DISTRIBUTED (`stat.bloomFilter` tree-
  * aggregates partial filters; the driver holds only the OR of the bit
  * arrays — O(bits), never O(keys)), embed it as a plan literal probed
  * by the codegen [[BloomMightContain]] expression — a map-side filter
  * on the fact scan, BEFORE any exchange — then restore exactness with a
  * residual join over the surviving sliver:
  *
  *   - [[semiJoin]]: survivors ⋉ keys removes the false positives; the
  *     shuffle carries ~selectivity + fpp of the fact instead of all of
  *     it. Result ≡ plain semi join, oracle-gated (`q_bloom_semi`).
  *   - [[antiJoin]]: a `might_contain = false` row is DEFINITELY absent
  *     — it bypasses the join entirely; only the might-contain sliver
  *     pays the residual anti join. Result ≡ plain anti join. The fact
  *     is scanned twice (both scans map-only and pruned; at 100 TB two
  *     cheap scans beat one full-fact shuffle — callers iterating on the
  *     same fact should persist it first).
  *
  * NULL fact keys follow join semantics exactly: dropped by semi, kept
  * by anti (the probe's three-valued NULL composes the same way a join
  * condition's would).
  *
  * @param expectedKeys sizing for the filter (overshoot is wasted bits,
  *   undershoot inflates fpp — both degrade gracefully, neither affects
  *   correctness); `fpp` the target false-positive rate
  */
object BloomPrefilter {

  private def filterBytesOf(keys: DataFrame, keyCol: String,
      expectedKeys: Long, fpp: Double): Array[Byte] = {
    require(expectedKeys > 0, "expectedKeys must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val bf = keys.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def semiJoin(fact: DataFrame, factKey: String, keys: DataFrame,
      keyCol: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val spark = fact.sparkSession
    BloomMightContain.register(spark)
    val bytes = filterBytesOf(keys, keyCol, expectedKeys, fpp)
    val pre = fact.filter(
      call_function("bloom_might_contain", lit(bytes), col(factKey)))
    val keySet = keys.select(col(keyCol).as("__bloom_key")).distinct()
    pre.join(keySet, col(factKey) === col("__bloom_key"), "left_semi")
  }

  def antiJoin(fact: DataFrame, factKey: String, keys: DataFrame,
      keyCol: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val spark = fact.sparkSession
    BloomMightContain.register(spark)
    val bytes = filterBytesOf(keys, keyCol, expectedKeys, fpp)
    val mc = call_function("bloom_might_contain", lit(bytes), col(factKey))
    // definite misses (false) AND null keys skip the join — both are
    // exactly the rows a plain anti join keeps unconditionally
    val definiteMiss = fact.filter(!coalesce(mc, lit(false)))
    val candidates = fact.filter(coalesce(mc, lit(false)))
    val keySet = keys.select(col(keyCol).as("__bloom_key")).distinct()
    definiteMiss.unionByName(
      candidates.join(keySet, col(factKey) === col("__bloom_key"), "left_anti"))
  }
}
