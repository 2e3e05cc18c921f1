package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** §2.10 — the reference's scheduled micro-batch semantics re-expressed as
  * Structured Streaming.
  *
  * The reference re-scans a 6-minute lookback every 5 minutes (overlapping
  * window, `etl_deepflow:31,641`), tolerates late rows via the 1-minute
  * overlap, and relies on idempotent merge for exactly-once effects. Here
  * the same computation is a sliding event-time window with a 1-minute
  * watermark; the transform is TRIGGER-AGNOSTIC — a pure
  * DataFrame→DataFrame function usable identically with
  * `spark.read` (batch), `Trigger.AvailableNow` (catch-up batch loop), or
  * `Trigger.ProcessingTime` (continuous micro-batch), which is what keeps
  * batch and streaming on one code path at 100 TB.
  */
object FlowStream {

  /** Sliding-window flow rollup: the streaming analog of
    * [[graft.ops.FlowRollup]] (top-k is per-sink, not per-window, so it is
    * not part of the incremental transform). Works on batch AND streaming
    * frames.
    */
  def windowedRollup(
      flows: DataFrame,
      srcCol: String,
      dstCol: String,
      valueCol: String,
      errPredicate: Column,
      windowLen: String = "6 minutes",
      slide: String = "5 minutes",
      watermark: String = "1 minute"
  ): DataFrame = {
    val v = col(valueCol)
    flows
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col(srcCol), col(dstCol))
      .agg(
        count(lit(1)).as("calls"),
        (sum(v.cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_value"),
        count(when(errPredicate, 1)).as("err_count"),
        max(col("ts")).as("last_seen"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(srcCol), col(dstCol), col("calls"), col("avg_value"),
        col("err_count"), col("last_seen"))
  }

  /** Wire a streaming rollup into a merge-style sink via foreachBatch —
    * each micro-batch merges idempotently into the graph store exactly the
    * way the reference's mergeV batches do (late re-delivery is absorbed
    * by last-wins column logic). */
  def sink(
      rolledUp: DataFrame,
      mergeBatch: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()
  ): DataStreamWriter[Row] =
    rolledUp.writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) => mergeBatch(batch, id) }
}
