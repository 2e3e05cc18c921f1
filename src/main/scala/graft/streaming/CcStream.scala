package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.ext.Components
import graft.model.GraphStorage

/** Streaming maintenance of connected-component labels — the streaming
  * face of [[Components.incrementalUpdate]]: each micro-batch of
  * near-dup edges folds into the standing cluster assignment (resolve →
  * batch-bounded contraction → broadcast merge-map apply), and the new
  * labeling commits as an immutable [[GraphStorage]] snapshot. A
  * continuously-ingesting dedup pipeline reads the latest snapshot for
  * its keep/drop decisions without ever re-clustering history.
  *
  * State lives in the snapshot store, not the Spark state store (the
  * [[StreamingNearDup]]/[[SketchStream]] discipline): restart recovers
  * from files alone. Replay posture, same honesty as
  * [[FrequentStream]]: foreachBatch is at-least-once, and re-applying a
  * batch of edges to labels that already absorbed them is a SEMANTIC
  * no-op (merging merged components changes nothing — spec-pinned), so
  * a replayed batch commits a new snapshot with IDENTICAL content; the
  * gated invariant is the label table, which is batching- and
  * replay-invariant. [[GraphStorage.expireSnapshots]] bounds the
  * version history; time travel across versions is the audit trail
  * ("when did these two docs merge?").
  *
  * Scale: per batch the history is touched exactly twice (endpoint
  * resolve + broadcast label apply — [[Components.incrementalUpdate]]'s
  * contract) and rewritten once. The rewrite is the honest cost of
  * file-based state with min-id label semantics: a merge can relabel an
  * arbitrarily old component, so labels are not append-only. Pair it
  * with [[SnapshotDiff]] to emit per-batch label CHANGES downstream.
  */
object CcStream {

  private def emptyLabels(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("node"), col("id").as("component"))

  /** Fold each micro-batch of (srcCol, dstCol) edges into the labels at
    * `labelsRoot`, one committed snapshot per non-empty batch. */
  def maintain(
      stream: DataFrame,
      srcCol: String,
      dstCol: String,
      labelsRoot: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { applyBatch(batch, srcCol, dstCol, labelsRoot); () }
      }

  /** One fold step, shared by the stream and by replay tests. */
  def applyBatch(batch: DataFrame, srcCol: String, dstCol: String,
      labelsRoot: String): Long = {
    val spark = batch.sparkSession
    // pin the PROBED version: re-resolving latest inside readSnapshot
    // would both double the listing I/O and open a window where a
    // concurrent expire/maintainer swaps the snapshot under us
    val prior = GraphStorage.latestVersion(spark, labelsRoot)
      .map(v => GraphStorage.readSnapshot(spark, labelsRoot, Some(v)))
      .getOrElse(emptyLabels(spark))
    GraphStorage.commitSnapshot(
      Components.incrementalUpdate(prior, batch, srcCol, dstCol),
      labelsRoot)
  }

  /** The standing labels (latest committed snapshot). */
  def labels(spark: SparkSession, labelsRoot: String): DataFrame =
    GraphStorage.readSnapshot(spark, labelsRoot)
}
