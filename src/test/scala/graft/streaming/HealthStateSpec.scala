package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.ops.AntiJoinGC
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class HealthStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val ExpiryMs = 5 * 60 * 1000L // 5 minutes

  test("reset-then-degrade + last_seen expiry matches batch AntiJoinGC") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Boolean)]
    val events = mem.toDF().toDF("key", "ts", "is_alarm")
      .as[HealthState.ResourceEvent]

    var captured = Vector.empty[HealthState.Snapshot]
    val q = HealthState(events, ExpiryMs, watermarkDelay = "1 minute")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[HealthState.Snapshot], _: Long) =>
        captured = captured ++ b.collect()
      }.start()

    // batch 1: A healthy (seen recently), B degraded (alarm, but stale —
    // last event 00:01, expiry horizon 5 min)
    mem.addData(
      ("A", ts("2024-01-01 00:02:00"), false),
      ("B", ts("2024-01-01 00:01:00"), true),
      ("A", ts("2024-01-01 00:16:00"), false))
    q.processAllAvailable()
    // batch 2: C arrives at 00:20; watermark advances to 00:15, which is
    // past B's timeout (00:01 + 5 min = 00:06) → B expires this batch
    mem.addData(("C", ts("2024-01-01 00:20:00"), false))
    q.processAllAvailable()
    // empty batch to fire timeouts armed against the new 00:19 watermark
    mem.addData(("C", ts("2024-01-01 00:20:30"), false))
    q.processAllAvailable()
    q.stop()

    val byStatus = captured.groupBy(_.health_status)
    // reset-then-degrade: B was degraded while alive, A never was
    assert(byStatus("degraded").map(_.key).toSet == Set("B"))
    assert(byStatus("healthy").map(_.key).toSet == Set("A", "C"))
    assert(captured.filter(_.key == "A").forall(_.health_status == "healthy"))

    // the streaming-expired set must equal the batch anti-join GC verdict
    // over the same input at the same horizon (watermark 00:15 after the
    // 00:16 max event of batch 1, minus the 5-minute expiry)
    val expired = byStatus.getOrElse("expired", Vector.empty).map(_.key).toSet
    val stored = Seq("A", "B").toDF("key") // keys known after batch 1
    val live = Seq( // events still inside the expiry horizon at 00:15
      ("A", ts("2024-01-01 00:16:00"))).toDF("key", "ts")
    val batchStale = AntiJoinGC.stale(stored, live, Seq("key"))
      .select("key").as[String].collect().toSet
    assert(expired == batchStale)
    assert(expired == Set("B"))

    // expired rows carry the terminal state (alarm count + last_seen)
    val b = captured.find(s => s.key == "B" && s.health_status == "expired").get
    assert(b.n_alarms == 1L && b.last_seen == ts("2024-01-01 00:01:00"))
  }

  test("a key with alarms in one batch degrades, then resets to healthy") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Boolean)]
    val events = mem.toDF().toDF("key", "ts", "is_alarm")
      .as[HealthState.ResourceEvent]
    var captured = Vector.empty[HealthState.Snapshot]
    val q = HealthState(events, ExpiryMs)
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[HealthState.Snapshot], _: Long) =>
        captured = captured ++ b.collect()
      }.start()
    mem.addData(("A", ts("2024-01-01 00:01:00"), true))
    q.processAllAvailable()
    mem.addData(("A", ts("2024-01-01 00:02:00"), false))
    q.processAllAvailable()
    q.stop()
    assert(captured.map(s => (s.health_status, s.n_alarms)) ==
      Vector(("degraded", 1L), ("healthy", 0L)))
  }
}
