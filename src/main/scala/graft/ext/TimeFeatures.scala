package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key temporal feature engineering — the lag/delta/rolling-window
  * derivations a sequence-model pipeline computes per entity before
  * training (previous value, time since last event, short-horizon mean
  * and peak).
  *
  * Determinism contract: the window orders by (ts, tieCol) — a TOTAL
  * order, so frame boundaries are engine-independent even under equal
  * timestamps. The rolling mean routes the sum through decimal(18,2)
  * (exact, order-independent) and divides by the frame row count,
  * mirroring the decSum pattern the aggregate queries use; lag/delta/max
  * move raw values and are exact by construction.
  *
  * Shape for 100 TB: ONE ordered window over the entity key computes
  * every feature in a single shuffle-and-sort — rows-BETWEEN frames keep
  * state O(frame), and an entity's history shards naturally by the
  * partition key. No joins, no second pass.
  */
object TimeFeatures {

  /** Adds `prev_value`, `delta_ts` (seconds since the previous event),
    * `roll_mean` and `roll_max` (over the trailing `frameRows`+current
    * window) to `df`. */
  def derive(df: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, tieCol: String, frameRows: Int = 6): DataFrame = {
    require(keys.nonEmpty, "temporal features need at least one entity key")
    require(frameRows >= 0, "frameRows must be >= 0")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val frame = w.rowsBetween(-frameRows, Window.currentRow)
    val v = col(valCol)
    df.withColumn("prev_value", lag(v, 1).over(w))
      // unix_timestamp (epoch seconds, floored) — the cross-engine time
      // identity q_time_math established (≡ DuckDB floor(epoch(ts)))
      .withColumn("delta_ts",
        unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(w)))
      .withColumn("roll_mean",
        (sum(v.cast("decimal(18,2)")).over(frame).cast("double") /
          count(lit(1)).over(frame)))
      .withColumn("roll_max", max(v).over(frame))
  }
}
