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
  * The BATCH face of this routing rule is
  * [[Expectations.auditRouted]] (every group audited as its own batch,
  * `publish` iff all rules pass) — hash-gated by `q_quality_gate`.
  *
  * Exactly-once posture: `foreachBatch` gives at-least-once sink calls
  * with replayed batchIds on recovery — both sinks receive the batchId
  * so an idempotent writer (e.g. [[graft.model.GraphStorage]] snapshot
  * per batchId, or a MERGE) upgrades the gate to effectively-once. The
  * batch is persisted for the audit + sink actions (one source
  * materialization per micro-batch, not one per action) and unpersisted
  * before the next batch.
  */
object QualityGate {

  /** @param publish    (cleanBatch, batchId) sink
    * @param quarantine (dirtyBatch, batchId, auditReport rows) sink
    * @param trigger    defaults to AvailableNow (drain-and-stop); pass
    *                   e.g. `Trigger.ProcessingTime("1 minute")` for a
    *                   continuous gate */
  def gate(
      stream: DataFrame,
      rowRules: Seq[Expectations.RowRule],
      publish: (DataFrame, Long) => Unit,
      quarantine: (DataFrame, Long, Seq[Row]) => Unit,
      trigger: Trigger = Trigger.AvailableNow()
  ): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty) {
            val report = Expectations.audit(batch, rowRules).collect().toSeq
            if (report.forall(r => r.getAs[Boolean]("pass"))) publish(batch, id)
            else quarantine(batch, id, report)
          }
        } finally batch.unpersist()
      }
}
