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
  * foreachBatch file-state operators), n−1 events per live entity —
  * and the set of LIVE entities is itself bounded by `ttlMicros`: an
  * entity whose last event falls `ttlMicros` behind the watermark is
  * evicted (EVENT-time timeout, the [[HealthState]] pattern — a
  * processing-time TTL would couple eviction to wall-clock replay
  * speed), so high-cardinality streams (session ids, connection ids)
  * cannot grow the store without bound. An episode whose inter-step
  * silence exceeds the TTL is lost with the evicted tail — any
  * ttlMicros ≥ maxGapMicros preserves every legal episode, since
  * maxGap is the longest silence a live episode can contain.
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
  /** Public: the state encoder's generated code must reach it. (No tie
    * values: ties order events WITHIN a batch; the retained tail is
    * already ordered, and cross-batch order is the stated
    * entity-ordered-arrival precondition.) */
  final case class Tail(us: List[Long], typs: List[String])

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  def apply(events: Dataset[Ev], steps: Seq[String],
      maxGapMicros: Long, ttlMicros: Long = 86400L * 1000000L,
      watermarkDelay: String = "1 minute"): Dataset[Match] = {
    require(steps.size >= 2, "a sequence needs at least two steps")
    require(ttlMicros >= maxGapMicros,
      "ttlMicros < maxGapMicros would evict tails of still-live episodes")
    val spark = events.sparkSession
    import spark.implicits._
    val n = steps.size
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.entity)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entity: Long, it: Iterator[Ev], state: GroupState[Tail]) =>
          if (state.hasTimedOut) {
            state.remove() // idle entity: evict the tail, emit nothing
            Iterator.empty
          } else {
            val batch = it.toArray.sortBy(e => (micros(e.ts), e.tie))
            val prior = state.getOption.getOrElse(Tail(Nil, Nil))
            // Vectors: the window scan indexes positions repeatedly, and
            // a List would make the per-entity batch O(len²)
            val us = (prior.us ++ batch.map(e => micros(e.ts))).toVector
            val typs = (prior.typs ++ batch.map(_.typ)).toVector
            val out = (0 to us.length - n).iterator.flatMap { i =>
              val typesOk = (0 until n).forall(k => typs(i + k) == steps(k))
              val gapsOk = (1 until n).forall(k =>
                us(i + k) - us(i + k - 1) <= maxGapMicros)
              if (typesOk && gapsOk) Some(Match(entity, us(i), us(i + n - 1)))
              else None
            }.toVector
            state.update(Tail(us.takeRight(n - 1).toList,
              typs.takeRight(n - 1).toList))
            // timeout must stay ahead of the current watermark (the
            // HealthState straggler guard)
            val lastMs = us.lastOption.map(_ / 1000L).getOrElse(0L)
            state.setTimeoutTimestamp(math.max(
              lastMs + ttlMicros / 1000L, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
