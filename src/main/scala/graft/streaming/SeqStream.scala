package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming contiguous event-sequence detection — the streaming face
  * of [[graft.ops.EventSeq.matchContiguous]]: episodes are emitted as
  * they COMPLETE, micro-batch by micro-batch, instead of waiting for a
  * batch pass over the timeline. Alerting is the use case the batch
  * operator can't serve: scan → probe → exfiltrate should page within
  * one trigger interval of the last step.
  *
  * State per entity is exactly the last n−1 (ts, type) events — the
  * only suffix a future event can extend into a match. Each batch
  * sorts ITS OWN events under the (ts, tie) total order, prepends the
  * state tail, scans every n-window of the concatenation, and keeps
  * the last n−1 events as the new tail. No window can be emitted
  * twice: the tail holds at most n−1 events, so every complete window
  * contains at least one event of the current batch. State is in the
  * Spark state store (checkpointed transactionally — replay
  * exactly-once is the ENGINE's contract here, unlike the
  * foreachBatch file-state operators), bounded at n−1 rows per live
  * entity.
  *
  * Precondition, stated honestly: events must arrive entity-ordered
  * ACROSS micro-batches (within a batch any order is fine — the batch
  * sorts). An event older than the retained tail would need the
  * already-discarded suffix to evaluate contiguity; use the batch
  * operator for replayable history, this one for live tails. The spec
  * pins stream ≡ batch on ordered arrival, including matches that
  * span batch boundaries.
  */
object SeqStream {

  final case class Ev(entity: Long, ts: Timestamp, tie: Long, typ: String)
  final case class Match(entity: Long, start_us: Long, end_us: Long)
  /** Public: the state encoder's generated code must reach it. */
  final case class Tail(us: List[Long], ties: List[Long], typs: List[String])

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  def apply(events: Dataset[Ev], steps: Seq[String],
      maxGapMicros: Long): Dataset[Match] = {
    require(steps.size >= 2, "a sequence needs at least two steps")
    val spark = events.sparkSession
    import spark.implicits._
    val n = steps.size
    events
      .groupByKey(_.entity)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity: Long, it: Iterator[Ev], state: GroupState[Tail]) =>
          val batch = it.toArray.sortBy(e => (micros(e.ts), e.tie))
          val prior = state.getOption.getOrElse(Tail(Nil, Nil, Nil))
          // Vectors: the window scan indexes positions repeatedly, and
          // a List would make the per-entity batch O(len²)
          val us = (prior.us ++ batch.map(e => micros(e.ts))).toVector
          val ties = (prior.ties ++ batch.map(_.tie)).toVector
          val typs = (prior.typs ++ batch.map(_.typ)).toVector
          val out = (0 to us.length - n).iterator.flatMap { i =>
            val typesOk = (0 until n).forall(k => typs(i + k) == steps(k))
            val gapsOk = (1 until n).forall(k =>
              us(i + k) - us(i + k - 1) <= maxGapMicros)
            if (typesOk && gapsOk) Some(Match(entity, us(i), us(i + n - 1)))
            else None
          }.toVector
          state.update(Tail(us.takeRight(n - 1).toList,
            ties.takeRight(n - 1).toList, typs.takeRight(n - 1).toList))
          out.iterator
      }
  }
}
