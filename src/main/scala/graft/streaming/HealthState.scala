package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.10 — custom keyed state: the streaming face of the reference's
  * reset-then-degrade health pass plus its liveness GC.
  *
  * Batch reference behavior: every ETL run resets each vertex to
  * `health_status=healthy`, then the alarm join re-marks the degraded ones
  * (`lambda/etl_aws/neptune_etl_aws.py:1469,2074-2111`); separately, GC
  * drops vertices whose keys the latest scan no longer reports
  * (`etl_aws:1932-2066` — the batch [[graft.ops.AntiJoinGC]]).
  *
  * Streaming re-expression with `flatMapGroupsWithState`:
  *  - each micro-batch recomputes a key's health from THAT batch's alarm
  *    events (reset-then-degrade, not an accumulator),
  *  - `last_seen` rides the state and arms an EVENT-TIME timeout at
  *    `last_seen + expiry`: when the watermark passes it the key is emitted
  *    once as `expired` and its state removed — the exact streaming analog
  *    of the anti-join GC, with state bounded by the expiry horizon.
  */
object HealthState {

  /** Input: one row per resource observation. */
  final case class ResourceEvent(key: String, ts: Timestamp, is_alarm: Boolean)

  /** Output: one row per (key, micro-batch) plus one terminal
    * `expired` row per GC'd key. */
  final case class Snapshot(key: String, health_status: String,
      n_alarms: Long, last_seen: Timestamp)

  /** Internal per-key state (public: the state encoder's generated code
    * must reach the synthetic constructor). */
  final case class KeyState(nAlarms: Long, lastSeenMs: Long)

  def apply(
      events: Dataset[ResourceEvent],
      expiryMs: Long,
      watermarkDelay: String = "1 minute"
  ): Dataset[Snapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[ResourceEvent], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Snapshot(key, "expired", s.nAlarms, new Timestamp(s.lastSeenMs)))
          } else {
            val evs = it.toArray
            val prevLast = state.getOption.map(_.lastSeenMs).getOrElse(0L)
            val batchAlarms = evs.count(_.is_alarm).toLong
            val lastSeen = math.max(prevLast, evs.map(_.ts.getTime).max)
            state.update(KeyState(batchAlarms, lastSeen))
            // timeout must stay ahead of the current watermark (a straggler
            // inside the allowed lateness could otherwise arm it in the past)
            state.setTimeoutTimestamp(
              math.max(lastSeen + expiryMs, state.getCurrentWatermarkMs() + 1))
            Iterator(Snapshot(key,
              if (batchAlarms > 0) "degraded" else "healthy",
              batchAlarms, new Timestamp(lastSeen)))
          }
      }
  }
}
