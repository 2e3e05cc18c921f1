package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.ops.Expectations

/** Streaming data-quality gate: every micro-batch is audited against
  * declarative [[Expectations]] rules inside `foreachBatch`; a batch
  * that passes every rule flows to the publish sink, a batch with any
  * violation routes — whole, with its audit report — to the quarantine
  * sink instead. Quarantining the whole batch (not just bad rows) is
  * deliberate: a violation means the SOURCE is misbehaving, and
  * shipping the "clean remainder" of a corrupt batch publishes data
  * under an unverifiable assumption.
  *
  * Exactly-once posture: `foreachBatch` gives at-least-once sink calls
  * with replayed batchIds on recovery — both sinks receive the batchId
  * so an idempotent writer (e.g. [[graft.model.GraphStorage]] snapshot
  * per batchId, or a MERGE) upgrades the gate to effectively-once. The
  * audit itself is a handful of aggregates per micro-batch, so the gate
  * adds one pass over each batch and no state between batches.
  */
object QualityGate {

  /** @param publish    (cleanBatch, batchId) sink
    * @param quarantine (dirtyBatch, batchId, auditReport rows) sink */
  def gate(
      stream: DataFrame,
      rowRules: Seq[Expectations.RowRule],
      publish: (DataFrame, Long) => Unit,
      quarantine: (DataFrame, Long, Seq[Row]) => Unit
  ): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (batch.isEmpty) ()
        else {
          val report = Expectations.audit(batch, rowRules).collect().toSeq
          if (report.forall(r => r.getAs[Boolean]("pass"))) publish(batch, id)
          else quarantine(batch, id, report)
        }
      }
}
