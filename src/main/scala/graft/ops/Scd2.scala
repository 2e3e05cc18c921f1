package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history build: collapse an observation
  * stream into one row per (key, attribute-state change) with
  * `[valid_from, valid_to)` validity and an `is_current` flag — the batch
  * formulation of the vertex store's "what did this resource look like at
  * time T" question (the reference keeps only last-wins state,
  * `lambda/etl_aws/neptune_etl_aws.py:209-275`; SCD2 is the auditable
  * superset a warehouse keeps).
  *
  * Change detection is null-safe per attribute (`<=>`): consecutive
  * observations with identical tracked attributes collapse into the first.
  *
  * Cost: ONE shuffle on the key. Both windows (change detection, then
  * `lead` over the surviving change rows) share the same partitioning and
  * sort order, so Spark plans a single exchange + sort with no second
  * shuffle. Ordering must be total per key — pass `tieBreak` columns
  * (e.g. an event id) when the timestamp alone can collide, or row
  * selection is nondeterministic in ANY engine.
  */
object Scd2 {
  def history(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      attrs: Seq[String],
      tieBreak: Seq[String] = Nil
  ): DataFrame = {
    val ord = (tsCol +: tieBreak).map(c => col(c).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    df.select((keys ++ Seq(tsCol) ++ tieBreak ++ attrs).distinct.map(col): _*)
      .withColumn("__chg", row_number().over(w) === 1 || changed)
      .filter(col("__chg"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keys.map(col) ++ attrs.map(col) ++ Seq(
        col(tsCol).as("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
