package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable DETERMINISTIC quantile sketches — the DDSketch idea
  * (relative-error log buckets) rebuilt on exact integer arithmetic so
  * the same data yields the same estimate in ANY engine, in any
  * partition order:
  *
  *   m     = floor(value · 100)          (centi-units, exact in IEEE)
  *   qd    = decimal digit count of m    (the magnitude)
  *   qlead = first two digits of m       (the mantissa bucket)
  *
  * A bucket (qd, qlead) covers [qlead·10^(qd−2), (qlead+1)·10^(qd−2))
  * centi-units — relative width ≤ 1/qlead ≤ 10% (values ≥ 0.10), so a
  * quantile read from the bucket midpoint is within 5% relative error,
  * guaranteed, not probabilistically (KLL/t-digest compaction is
  * randomized and order-dependent — unusable where runs must be
  * reproducible bit-for-bit). Values below 0.10 degrade gracefully to
  * ±half a centi-unit ABSOLUTE error.
  *
  * Why sketch at all: the 100 TB pattern is per-slice (per-day,
  * per-source) sketch tables persisted as a few hundred tiny rows each;
  * any later rollup — p95 per type over a year — SUMS bucket counts and
  * never rescans raw data. Merge is exact (counts add), so
  * rollup-of-daily ≡ direct-over-raw bit-for-bit, spec-asserted. An
  * exact percentile over the same year is a full re-sort of everything.
  *
  * Estimates are emitted ×200 as BIGINT (`rep_x200` = midpoint in
  * half-centi-units): the one representation with no float division
  * anywhere, hence hash-comparable across engines.
  *
  * Domain: positive values up to 1e16 (18 centi-digits). Beyond that
  * `rep_x200` would exceed Long range — and Spark wraps silently where
  * a SQL engine's int128 keeps going, so the bound matters for parity,
  * not just overflow. Metric/latency-style columns sit far inside it.
  */
object Quantiles {

  private def bucketed(df: DataFrame, valCol: String): DataFrame =
    df.filter(col(valCol) > 0)
      .withColumn("m", floor(col(valCol) * 100).cast("long").cast("string"))
      .withColumn("qd", length(col("m")).cast("long"))
      .withColumn("qlead", substring(col("m"), 1, 2).cast("long"))
      .drop("m")

  /** Per-`keys` sketch over a positive double column: one row per
    * (keys..., qd, qlead) with its count. This is the per-slice build
    * that gets persisted. Non-positive / null values are excluded. */
  def sketch(df: DataFrame, keys: Seq[String], valCol: String): DataFrame =
    bucketed(df, valCol)
      .groupBy(keys.map(col) :+ col("qd") :+ col("qlead"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Roll persisted sketches up to `rollupKeys` (a subset of the build
    * keys): counts add, so this merge is EXACT — never touches raw data. */
  def rollup(sketches: DataFrame, rollupKeys: Seq[String]): DataFrame = {
    require(rollupKeys.nonEmpty, "rollup needs at least one key")
    sketches.groupBy(rollupKeys.map(col) :+ col("qd") :+ col("qlead"): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile estimates from a sketch. Each requested quantile is a
    * (outputName, num, den) rational; the estimate is the midpoint of
    * the first bucket whose cumulative count reaches ceil(num·N/den)
    * (percentile_disc rank semantics), emitted as `rep_x200` BIGINT
    * (midpoint · 200). Bucket midpoints are strictly monotone in
    * (qd, qlead) order, so "first qualifying bucket" is a plain MIN. */
  def estimate(sk: DataFrame, keys: Seq[String],
      qs: Seq[(String, Int, Int)]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    val ordered = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("qd"), col("qlead"))
    val whole = Window.partitionBy(keys.map(col): _*)
    val prepared = sk
      .withColumn("cum", sum(col("cnt")).over(ordered))
      .withColumn("n", sum(col("cnt")).over(whole))
      .withColumn("rep_x200",
        (lit(2L) * col("qlead") + lit(1L)) *
          expr("cast(concat('1', repeat('0', cast(greatest(qd - 2, 0) as int))) as bigint)"))
    val aggs = max(col("n")).as("n") +: qs.map { case (name, num, den) =>
      min(when(col("cum") >= expr(s"($num * n + ${den - 1}) div $den"),
        col("rep_x200"))).as(name)
    }
    prepared.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
