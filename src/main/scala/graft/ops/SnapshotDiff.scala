package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diff two store snapshots into a change feed — the CDC shape between
  * versions of the vertex store ([[graft.model.GraphStorage]] snapshots):
  * one row per key that was `added`, `removed`, or `changed` in any
  * tracked column, with the old and new values side by side. Unchanged
  * keys produce no row. The reference answers "what changed since the
  * last run" by re-scanning everything; a full-outer shuffle join on the
  * key is the one-pass batch formulation.
  *
  * Change detection is null-safe (`<=>`) per tracked column.
  */
object SnapshotDiff {
  def apply(
      old: DataFrame,
      current: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]
  ): DataFrame = {
    val o = old.alias("o")
    val c = current.alias("c")
    val joinCond = keys.map(k => col(s"o.$k") <=> col(s"c.$k")).reduce(_ && _)
    val oldPresent = keys.map(k => col(s"o.$k").isNotNull).reduce(_ || _)
    val curPresent = keys.map(k => col(s"c.$k").isNotNull).reduce(_ || _)
    val anyChanged: Column = compareCols
      .map(cc => !(col(s"o.$cc") <=> col(s"c.$cc")))
      .reduce(_ || _)
    o.join(c, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"c.$k"), col(s"o.$k")).as(k)) ++
          Seq(when(!oldPresent, "added")
            .when(!curPresent, "removed")
            .when(anyChanged, "changed")
            .otherwise("unchanged").as("change_type")) ++
          compareCols.flatMap(cc => Seq(
            col(s"o.$cc").as(s"old_$cc"), col(s"c.$cc").as(s"new_$cc"))): _*)
      .filter(col("change_type") =!= "unchanged")
  }
}
