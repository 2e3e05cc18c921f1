package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode–Muthukrishnan 2005): a d×w grid of
  * counters answering point-frequency queries with one-sided error —
  * est(k) ≥ true(k) always, est(k) ≤ true(k) + εN with probability
  * 1 − δ at w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. The fixed-size frequency summary
  * a 100 TB pipeline keeps when the key domain is unbounded (URL
  * hosts, n-grams, user ids) and Misra-Gries' top-k contract is the
  * wrong shape: CM answers ANY key after the fact, and two sketches
  * MERGE by cell-wise addition — shards, days, or streams combine
  * without touching raw data. Completes the sketch family next to
  * [[FrequentItems]] (heavy hitters), HLL (distinct), and
  * [[Quantiles]] (ranks).
  *
  * Determinism: row i's bucket for key k is the first 4 md5 nibbles
  * of "seed|i|k" mod w — the engine-shared md5 coin (the
  * [[RandomProjection]]/simhash/walks precedent), so the ENTIRE
  * sketch table and every estimate replay bit-for-bit in SQL
  * (q_countmin / q_countmin_est); no RNG-seeded hash family an
  * external engine can't reproduce.
  *
  * Scale shape: ONE corpus pass; the map-side ×d row blowup feeds a
  * partial-aggregated groupBy(i, j), so the exchange is at most
  * d·w·executors cells regardless of corpus size, and the sketch
  * itself (≤ d·w rows) is driver/broadcast-sized by construction.
  * [[estimate]] broadcasts the sketch into the query batch — one
  * hash-join, no corpus anywhere. [[merge]] is a union + re-sum:
  * merge-only rollups, the [[Sketches]] discipline.
  */
object CountMin {

  /** Bucket of `k` (a string column) in row `i`: first 4 md5 nibbles
    * of "seed|i|k", mod w — 16 bits of coin, so w must stay ≤ 2¹⁶ for
    * the bucket distribution to cover every cell. */
  private def bucket(seed: Long, i: Column, k: Column, w: Int): Column =
    conv(substring(md5(concat_ws("|", lit(seed), i, k)), 1, 4), 16, 10)
      .cast("long") % w

  private def checkShape(d: Int, w: Int): Unit = {
    require(d >= 1, s"d must be >= 1: $d")
    require(w >= 1 && w <= 65536,
      s"w must be in [1, 65536] (4 md5 nibbles of coin): $w")
  }

  /** Build the sketch: (i, j, cnt) for hash rows i ∈ [0, d), buckets
    * j ∈ [0, w) — only touched cells appear (absent cell ≡ 0; keeps
    * the exchange sparse when n ≪ d·w). Null keys are REJECTED loudly:
    * silently dropping them would understate every estimate. */
  def sketch(df: DataFrame, keyCol: String, d: Int, w: Int,
      seed: Long = 42L): DataFrame = {
    checkShape(d, w)
    val k = col(keyCol).cast("string")
    val nNull = df.filter(k.isNull).limit(1).count()
    require(nNull == 0L,
      s"CountMin: NULL $keyCol rows would silently vanish from counts")
    // parallelism floor before the ×d explode + per-row md5 buckets —
    // the sketch pass is pure per-row hashing and otherwise serializes
    // into a single-task scan stage on under-split inputs
    graft.model.Parallelism.floor(df.select(k.as("k")))
      .select(col("k"),
        explode(expr(s"sequence(0, ${d - 1})")).as("i"))
      .select(col("i"), bucket(seed, col("i"), col("k"), w).as("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for a key batch: (key, est) with
    * est = minᵢ cnt(i, bucket(i, key)) and untouched cells read as 0.
    * The sketch (≤ d·w rows) broadcasts; `keys` is never shuffled. */
  def estimate(sk: DataFrame, keys: DataFrame, keyCol: String,
      d: Int, w: Int, seed: Long = 42L): DataFrame = {
    checkShape(d, w)
    val k = col(keyCol).cast("string")
    keys.select(k.as("key"))
      .distinct()
      .select(col("key"), explode(expr(s"sequence(0, ${d - 1})")).as("i"))
      .withColumn("j", bucket(seed, col("i"), col("key"), w))
      .join(broadcast(sk), Seq("i", "j"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** [[sketch]] + [[estimate]] FUSED over a pre-aggregated
    * (key, weight) frame — for callers that already hold per-key
    * counts (a df table) and probe the sketch with exactly the keys it
    * was built from (the hot-key derivations). Bit-identical to
    * `estimate(sketch(repeat keys by weight), distinct keys)`:
    * cell cnt = Σ weight of the keys hashing there, est = min over the
    * key's d cells — but the d md5 buckets are computed ONCE per
    * DISTINCT key instead of once per posting row for the build plus
    * once per distinct key for the probe, and the sketch/probe join
    * collapses into one windowed pass. Returns the keys with
    * est ≥ `minEst` (the cap list), keyed `keyCol`.
    *
    * Caller guarantees non-null keys (the shingle/band frames are
    * md5-derived, never null) — the one-sided est ≥ true contract is
    * [[sketch]]'s, unchanged. */
  private[ext] def hotKeysWeighted(keyed: DataFrame, keyCol: String,
      weightCol: String, minEst: Long, d: Int, w: Int,
      seed: Long = 42L): DataFrame = {
    checkShape(d, w)
    import org.apache.spark.sql.expressions.Window
    keyed
      .select(col(keyCol).cast("string").as("key"),
        col(weightCol).cast("long").as("wt"))
      .select(col("key"), col("wt"),
        explode(expr(s"sequence(0, ${d - 1})")).as("i"))
      .select(col("key"), col("wt"), col("i"),
        bucket(seed, col("i"), col("key"), w).as("j"))
      .withColumn("cnt", sum(col("wt")).over(
        Window.partitionBy(col("i"), col("j"))))
      .groupBy(col("key"))
      .agg(min(col("cnt")).as("est"))
      .filter(col("est") >= minEst)
      .select(col("key").as(keyCol))
  }

  /** Cell-wise sum of two sketches built with the SAME (d, w, seed) —
    * sketch(A ⊎ B) exactly (spec-pinned). The caller owns the shape
    * agreement; mismatched shapes would silently mis-bucket. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("i"), col("j"))
      .agg(sum(col("cnt")).as("cnt"))
}
