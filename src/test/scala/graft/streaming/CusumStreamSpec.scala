package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming CUSUM contracts: alarms must equal the reference fold on
  * ordered arrival — including evidence accumulated across micro-batch
  * boundaries — and fire in the batch where they complete.
  */
class CusumStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)
  private def us(s: Long) = s * 1000000L
  private val (mu0, kappa, h) = (10000L, 500L, 3000L) // q-units (·1000)

  private def runStream(batches: Seq[Seq[CusumStream.Obs]],
      ttlMicros: Long = 86400L * 1000000L): Seq[(Long, Long, String, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[CusumStream.Obs]
    val out = CusumStream(mem.toDS(), mu0, kappa, h, ttlMicros = ttlMicros)
    val qname = s"cusumstream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(qname).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2)).toSeq
  }

  private def reference(entity: Long, evs: Seq[CusumStream.Obs]) =
    CusumStream.referenceFold(
        evs.sortBy(o => (o.ts.getTime, o.tie))
          .map(o => (o.ts.getTime * 1000L, o.value)),
        mu0, kappa, h)
      .map(a => (entity, a._1, a._2, a._3))

  test("stream == reference fold, evidence spanning batch boundaries") {
    // drift of +1.2 per obs over the 10.0 target: each obs adds 700 to
    // S+; the 5th crosses h=3000 — in batch 2
    val evs = (1 to 8).map(i =>
      CusumStream.Obs(1L, ts(i * 10), i.toLong, 11.2))
    val out = runStream(Seq(evs.take(3), evs.drop(3)))
    assert(out === reference(1L, evs))
    assert(out.nonEmpty && out.head._3 === "high")
  }

  test("low-side shifts alarm on the negative sum") {
    val evs = (1 to 6).map(i =>
      CusumStream.Obs(2L, ts(i * 10), i.toLong, 8.5)) // each adds 1000 to S-
    val out = runStream(Seq(evs))
    assert(out === reference(2L, evs))
    assert(out.forall(_._3 === "low"))
  }

  test("restart after alarm: sums reset, next alarm needs fresh evidence") {
    val evs = (1 to 12).map(i =>
      CusumStream.Obs(3L, ts(i * 10), i.toLong, 11.2))
    val out = runStream(Seq(evs))
    val ref = reference(3L, evs)
    assert(out === ref)
    assert(out.size >= 2, s"expected repeated alarms, got $out")
  }

  test("on-target noise within the slack band never alarms") {
    val vals = Seq(10.3, 9.8, 10.4, 9.6, 10.2, 9.9, 10.1, 9.7)
    val evs = vals.zipWithIndex.map { case (v, i) =>
      CusumStream.Obs(4L, ts((i + 1) * 10), i.toLong, v) }
    assert(runStream(Seq(evs)).isEmpty)
  }

  test("entities fold independently") {
    val a = (1 to 5).map(i => CusumStream.Obs(10L, ts(i * 10), i.toLong, 11.2))
    val b = (1 to 5).map(i => CusumStream.Obs(11L, ts(i * 10), i.toLong, 10.0))
    val out = runStream(Seq(a ++ b))
    assert(out === reference(10L, a))
  }

  test("TTL eviction zeroes a sleeper's accumulated evidence") {
    // entity 5 accumulates S+ = 2800 (one obs short of alarming), then
    // sleeps past the TTL while entity 6 advances the watermark far
    // ahead; on return, one more +700 obs must NOT alarm (fresh state:
    // 700 < 3000) — surviving state would fire at 3500
    // b2 advances the watermark past the sleeper's deadline; b2b is an
    // extra trigger WITHOUT entity-5 data so the timeout actually fires
    // (a key with data and a due timeout in the same batch is delivered
    // its data instead — Spark's documented timeout semantics)
    val ttl = us(100)
    val b1 = (1 to 4).map(i => CusumStream.Obs(5L, ts(i), i.toLong, 11.2))
    val b2 = Seq(CusumStream.Obs(6L, ts(5000), 1L, 10.0))
    val b2b = Seq(CusumStream.Obs(6L, ts(5010), 2L, 10.0))
    val b3 = Seq(CusumStream.Obs(5L, ts(5011), 9L, 11.2))
    val out = runStream(Seq(b1, b2, b2b, b3), ttlMicros = ttl)
    assert(out.isEmpty, s"sleeper state survived the TTL: $out")
  }

  test("same-trigger return: stale sums zero on the DATA path too") {
    // no helper trigger this time: the sleeper's return and its due
    // timeout land in the same batch, where Spark delivers the data
    // with hasTimedOut=false — the state's lastMs watermark check must
    // zero the sums (regression: review r11 found surviving state here)
    val ttl = us(100)
    val b1 = (1 to 4).map(i => CusumStream.Obs(5L, ts(i), i.toLong, 11.2))
    val b2 = Seq(CusumStream.Obs(6L, ts(5000), 1L, 10.0))
    val b3 = Seq(CusumStream.Obs(5L, ts(5001), 9L, 11.2))
    val out = runStream(Seq(b1, b2, b3), ttlMicros = ttl)
    assert(out.isEmpty, s"stale sums folded a sleeper's return: $out")
  }
}
