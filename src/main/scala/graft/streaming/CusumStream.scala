package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM control chart — the ONLINE face of
  * [[graft.ops.Changepoint]]: Page's two-sided cumulative-sum test per
  * entity, alarming within one trigger interval of a level shift
  * instead of waiting for a batch scan over the full series. The batch
  * operator answers "where did this series move" after the fact; this
  * one pages when it moves.
  *
  * Statistic, per entity in event order (same half-up quantization
  * grid as the batch face — all state is BIGINT, no float path):
  *
  *   S⁺ ← max(0, S⁺ + (q − μ₀ − κ));  alarm "high" when S⁺ > h, then 0
  *   S⁻ ← max(0, S⁻ + (μ₀ − q − κ));  alarm "low"  when S⁻ > h, then 0
  *
  * (κ the slack/allowance, h the decision threshold, both in quantized
  * units like μ₀ — the standard restart-after-alarm discipline, so
  * each alarm is evidence accumulated since the previous one.)
  *
  * State per entity is exactly two BIGINTs — no event retention at
  * all — and the set of LIVE entities is bounded by the event-time TTL
  * ([[HealthState]]/[[SeqStream]] pattern): an entity whose last event
  * falls `ttlMicros` behind the watermark is evicted, and if it
  * returns it restarts with zeroed sums (a monitor that slept through
  * the TTL horizon has no claim to its stale evidence).
  *
  * Precondition, stated honestly (the [[SeqStream]] contract): events
  * must arrive entity-ordered ACROSS micro-batches; within a batch any
  * order is fine — the batch sorts on (ts, tie). A cross-batch
  * straggler would fold into the sums out of order. Use the batch
  * operator for replayable history.
  */
object CusumStream {

  final case class Obs(entity: Long, ts: Timestamp, tie: Long, value: Double)
  /** One row per alarm, as it fires: `stat` is the S value that crossed
    * (in quantized units), `at_us` the event time that tripped it. */
  final case class Alarm(entity: Long, at_us: Long, side: String, stat: Long)
  /** Public: the state encoder's generated code must reach it.
    * `lastMs` rides along so the DATA path can self-detect staleness:
    * Spark delivers a key's new data INSTEAD of its due timeout when
    * both land in one trigger, so TTL zeroing cannot rely on the
    * timeout callback alone. */
  final case class Sums(sPos: Long, sNeg: Long, lastMs: Long)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  /** @param mu0Q    target level μ₀ in quantized units (value·scale)
    * @param slackQ  allowance κ ≥ 0 in quantized units
    * @param hQ      decision threshold h > 0 in quantized units
    * @param scale   the half-up quantization grid (batch-face default) */
  def apply(obs: Dataset[Obs], mu0Q: Long, slackQ: Long, hQ: Long,
      scale: Long = 1000L, ttlMicros: Long = 86400L * 1000000L,
      watermarkDelay: String = "1 minute"): Dataset[Alarm] = {
    require(slackQ >= 0, s"slack must be >= 0: $slackQ")
    require(hQ > 0, s"threshold must be > 0: $hQ")
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.entity)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entity: Long, it: Iterator[Obs], state: GroupState[Sums]) =>
          if (state.hasTimedOut) {
            state.remove() // idle entity: drop the sums, emit nothing
            Iterator.empty
          } else {
            val batch = it.toArray.sortBy(o => (micros(o.ts), o.tie))
            // stale-state self-check (the documented TTL contract): when
            // a sleeper's data and its due timeout land in the SAME
            // trigger, Spark delivers the data with hasTimedOut=false —
            // so staleness is decided here, against the watermark, not
            // only in the timeout callback
            val prior = state.getOption.getOrElse(Sums(0L, 0L, 0L))
            val stale = prior.lastMs > 0 &&
              state.getCurrentWatermarkMs() - prior.lastMs > ttlMicros / 1000L
            var (sPos, sNeg) =
              if (stale) (0L, 0L) else (prior.sPos, prior.sNeg)
            val alarms = Seq.newBuilder[Alarm]
            for (o <- batch) {
              val q = math.floor(o.value * scale + 0.5).toLong
              sPos = math.max(0L, sPos + (q - mu0Q - slackQ))
              if (sPos > hQ) {
                alarms += Alarm(entity, micros(o.ts), "high", sPos)
                sPos = 0L
              }
              sNeg = math.max(0L, sNeg + (mu0Q - q - slackQ))
              if (sNeg > hQ) {
                alarms += Alarm(entity, micros(o.ts), "low", sNeg)
                sNeg = 0L
              }
            }
            val lastMs = micros(batch.last.ts) / 1000L
            state.update(Sums(sPos, sNeg, lastMs))
            state.setTimeoutTimestamp(lastMs + ttlMicros / 1000L)
            alarms.result().iterator
          }
      }
  }

  /** The reference fold the spec pins the stream against — one entity's
    * alarms over in-order observations, same arithmetic, no Spark. */
  def referenceFold(values: Seq[(Long, Double)], mu0Q: Long, slackQ: Long,
      hQ: Long, scale: Long = 1000L): Seq[(Long, String, Long)] = {
    var (sPos, sNeg) = (0L, 0L)
    val out = Seq.newBuilder[(Long, String, Long)]
    for ((us, v) <- values) {
      val q = math.floor(v * scale + 0.5).toLong
      sPos = math.max(0L, sPos + (q - mu0Q - slackQ))
      if (sPos > hQ) { out += ((us, "high", sPos)); sPos = 0L }
      sNeg = math.max(0L, sNeg + (mu0Q - q - slackQ))
      if (sNeg > hQ) { out += ((us, "low", sNeg)); sNeg = 0L }
    }
    out.result()
  }
}
