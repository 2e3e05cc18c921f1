package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** AS-OF JOIN — for every left row, the single latest right row of the
  * same key with `rightTime <= leftTime` (the time-series lookup behind
  * "metric value in effect at event time"). Spark has no native as-of
  * join; the naive range join explodes to every (left, earlier-right)
  * pair before picking the max. This implementation is the
  * union-and-carry-forward formulation:
  *
  *   1. tag left rows side=1, right rows side=0, align schemas, UNION —
  *      no join node at all;
  *   2. one window per key ordered by (time, side): `last(struct,
  *      ignoreNulls)` carries the ENTIRE latest right row forward as a
  *      single struct (side 0 sorts first, so an equal-time right row IS
  *      visible to the left row — `>=` semantics, matching SQL ASOF).
  *      Carrying one struct — not each payload column independently —
  *      guarantees the payload values all come from the SAME right row
  *      even when some payload columns are legitimately NULL;
  *   3. keep side=1 rows, project struct fields back out.
  *
  * Cost: ONE shuffle on the key + a per-partition sort, linear in
  * |left| + |right| — the shape that survives a 100 TB fact stream
  * against a large dimension history. Left rows with no earlier right
  * row keep null payloads (left-outer semantics).
  *
  * `tolerance` (optional, same numeric/temporal difference semantics as
  * `leftTime - rightTime`): when set, a match older than the bound is
  * discarded — the left row keeps null right-side columns, matching the
  * common production "max staleness" variant.
  *
  * Right rows must be unique per (key, rightTime) — pre-aggregate
  * otherwise (ties would make "the" latest row ambiguous in ANY as-of
  * engine).
  */
object AsOfJoin {
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Column] = None
  ): DataFrame = {
    val leftPayload = left.columns
      .filterNot(c => keys.contains(c) || c == leftTime)
    val rightPayload = right.columns
      .filterNot(c => keys.contains(c) || c == rightTime)
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    // One struct holding the right timestamp plus every right payload
    // column: the unit of carry-forward (all-or-nothing per right row).
    val rStruct = StructType(
      StructField("__rt", rightTypes(rightTime), nullable = true) +:
        rightPayload.map(c => StructField(c, rightTypes(c), nullable = true)))

    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(rStruct).as("__r")): _*)
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).cast(leftTypes(leftTime)).as("__t"),
          lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(leftTypes(c)).as(c)) ++
        Seq(struct(
          col(rightTime).as("__rt") +: rightPayload.map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    val bounded = tolerance match {
      case Some(tol) => carried.withColumn("__r",
        when(col("__t") - col("__r.__rt") <= tol, col("__r")))
      case None => carried
    }
    bounded
      .filter(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftPayload.map(col) ++
        Seq(col("__r.__rt").as(rightTime)) ++
        rightPayload.map(c => col(s"__r.$c").as(c)): _*)
  }
}
