package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with forward fill — irregular per-entity
  * observations onto a regular grid, each grid point carrying the last
  * observation at or before it: the feature-store materialization step
  * before training on fixed-frequency sequences (and the batch twin of
  * a streaming state store's "latest value as of T").
  *
  * Mechanism: per entity, the grid spans the entity's own truncated
  * [min, max] observation range (`sequence` on timestamps — no
  * cross-entity calendar assumption, empty entities impossible by
  * construction); grid rows union with raw observations and ONE ordered
  * window carries the last non-null value forward. Grid points before
  * an entity's first in-step observation hold NULL (explicit, not
  * fabricated). The (ts, is_obs) order puts an observation exactly ON a
  * grid instant before the grid row, so boundary points see it.
  *
  * Shape for 100 TB: one bounds aggregate + one in-row sequence explode
  * (output ∝ entities × horizon/step) + one ordered window on the
  * entity key — the same single shuffle any sequence derivation pays.
  * Null-timestamp observations are dropped up front: they carry no
  * position on the grid, and Spark's ASC-nulls-FIRST default would
  * otherwise let them poison the leading (documented-NULL) grid points.
  *
  * Relationship to [[AsOfJoin]]: this is the same union + tagged-side +
  * carry-forward window family — specialised here with a generated grid
  * as the left side and per-timestamp tie-breaking on the observation
  * side; the two implementations share their ordering/frame contract.
  */
object Resample {

  /** @param step   an interval expression, e.g. "INTERVAL 1 HOUR"
    * @param tieCol breaks ties among observations sharing a timestamp
    *               (the LAST under the tie order carries) — without a
    *               total order the filled value would be run-dependent
    * @return (keys, grid_ts, value) — one row per entity per grid step. */
  def forwardFill(df: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, tieCol: String, step: String = "INTERVAL 1 HOUR",
      trunc: String = "hour"): DataFrame = {
    require(keys.nonEmpty, "resample needs at least one entity key")
    val clean = df.filter(col(tsCol).isNotNull)
    val bounds = clean.groupBy(keys.map(col): _*)
      .agg(min(date_trunc(trunc, col(tsCol))).as("__lo"),
        max(date_trunc(trunc, col(tsCol))).as("__hi"))
    val grid = bounds.select(keys.map(col) :+
      explode(expr(s"sequence(__lo, __hi, $step)")).as("__ts"): _*)
      .withColumn("__v", lit(null).cast(df.schema(valCol).dataType))
      .withColumn("__obs", lit(0))
      .withColumn("__tie", lit(null).cast(df.schema(tieCol).dataType))
    val obs = clean.select(keys.map(col) :+ col(tsCol).as("__ts") :+
      col(valCol).as("__v") :+ col(tieCol).as("__tie"): _*)
      .withColumn("__obs", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__obs").desc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs.unionByName(grid)
      .withColumn("__ff", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__obs") === 0)
      .select(keys.map(col) :+ col("__ts").as("grid_ts") :+
        col("__ff").as("value"): _*)
  }
}
