package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF JOIN — for every left row, the single latest right row of the
  * same key with `rightTime <= leftTime` (the time-series lookup behind
  * "metric value in effect at event time"). Spark has no native as-of
  * join; the naive range join explodes to every (left, earlier-right)
  * pair before picking the max. This implementation is the
  * union-and-carry-forward formulation:
  *
  *   1. tag left rows side=1, right rows side=0, align schemas, UNION —
  *      no join node at all;
  *   2. one window per key ordered by (time, side): `last(value,
  *      ignoreNulls)` carries each right payload forward to every later
  *      left row (side 0 sorts first, so an equal-time right row IS
  *      visible to the left row — `>=` semantics, matching SQL ASOF);
  *   3. keep side=1 rows.
  *
  * Cost: ONE shuffle on the key + a per-partition sort, linear in
  * |left| + |right| — the shape that survives a 100 TB fact stream
  * against a large dimension history. Left rows with no earlier right
  * row keep null payloads (left-outer semantics).
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
      rightTime: String
  ): DataFrame = {
    val leftPayload = left.columns
      .filterNot(c => keys.contains(c) || c == leftTime)
    val rightPayload = right.columns
      .filterNot(c => keys.contains(c) || c == rightTime)
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    def nullAs(name: String, tpe: org.apache.spark.sql.types.DataType): Column =
      lit(null).cast(tpe).as(name)

    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftPayload.map(col) ++
        Seq(nullAs("__rt", rightTypes(rightTime))) ++
        rightPayload.map(c => nullAs(c, rightTypes(c))): _*)
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).cast(leftTypes(leftTime)).as("__t"),
          lit(0).as("__side")) ++
        leftPayload.map(c => nullAs(c, leftTypes(c))) ++
        Seq(col(rightTime).as("__rt")) ++
        rightPayload.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = ("__rt" +: rightPayload.toSeq).foldLeft(
      taggedLeft.unionByName(taggedRight)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftPayload.map(col) ++
        Seq(col("__rt").as(rightTime)) ++ rightPayload.map(col): _*)
  }
}
