package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, native
  * in Spark) — THE 100 TB distinct-counting pattern: per-partition
  * (per-day, per-source) sketches are tiny persistent binaries, and any
  * later rollup — week over days, global over sources — merges sketches
  * WITHOUT touching raw data again. An exact distinct over a year of
  * raw events rescans everything; a sketch union reads kilobytes.
  *
  * `hll_union_agg` of per-slice sketches is mathematically identical to
  * sketching the concatenated raw data (HLL union is lossless at equal
  * lgK) — spec-asserted, because that identity is what makes persisted
  * sketch tables trustworthy. Estimates are approximate (~1.6% rel.
  * err at the default lgConfigK=12) but deterministic: the sketch of a
  * given SET is a pure function of the set, so the same data always
  * reports the same estimate. Pair with an exact twin
  * (`q_distinct_count` pattern) when small slices need exactness.
  */
object Sketches {

  /** One HLL sketch per `keys` group over `valCol` (binary column
    * `sk`) — the per-slice build that gets persisted. */
  def distinctSketch(df: DataFrame, keys: Seq[String],
      valCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valCol)).as("sk"))

  /** Roll persisted sketches up to `rollupKeys` (a subset of the build
    * keys) and estimate: merge-only, never touches raw data. */
  def rollupEstimate(sketches: DataFrame,
      rollupKeys: Seq[String]): DataFrame = {
    require(rollupKeys.nonEmpty, "rollup needs at least one key")
    sketches.groupBy(rollupKeys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("approx_distinct"))
  }
}
