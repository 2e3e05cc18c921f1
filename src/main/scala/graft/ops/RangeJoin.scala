package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RANGE JOIN (point-in-interval) — every left point row joined to the
  * right interval rows containing it: `lo <= t < hi` (+ optional equi
  * keys). Spark plans a bare range predicate as a nested-loop join —
  * quadratic when both sides are large. This implementation BUCKETIZES:
  * each interval explodes to the fixed-width buckets it overlaps, each
  * point hashes to its single bucket, the join is a plain equi join on
  * (keys, bucket) and the exact predicate filters the candidates. Cost:
  * one shuffle + O(points + intervals · buckets-per-interval) rows — the
  * standard interval-index shape that survives two large sides.
  *
  * `bucketWidth` tunes fan-out: ~the typical interval length gives ≤ 2-3
  * buckets per interval. A pathologically long interval fans out to
  * `length / bucketWidth` bucket rows — bound it by splitting such
  * intervals upstream (they are the skew key of this operator).
  */
object RangeJoin {
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__b",
      floor(col(tCol) / bucketWidth).cast("long"))
    // hi is exclusive but floor(hi/w) is still generated: an interval
    // ending exactly on a bucket boundary contributes nothing there and
    // the exact predicate removes it — cheaper than special-casing.
    val rb = right.withColumn("__b", explode(expr(
      s"sequence(CAST(floor($loCol / $bucketWidth) AS BIGINT), " +
        s"CAST(floor($hiCol / $bucketWidth) AS BIGINT))")))
    lb.join(rb, keys :+ "__b")
      .filter(col(tCol) >= col(loCol) && col(tCol) < col(hiCol))
      .drop("__b")
  }
}
