package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming CEP contracts: the stream must emit exactly the batch
  * operator's matches on ordered arrival — including episodes spanning
  * micro-batch boundaries — as they complete.
  */
class SeqStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)
  private val steps = Seq("a", "b", "c")
  private val gapUs = 60L * 1000000L

  private def runStream(batches: Seq[Seq[SeqStream.Ev]]): Set[(Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SeqStream.Ev]
    val out = SeqStream(mem.toDS(), steps, gapUs)
    val qname = s"seqstream_${System.nanoTime()}"
    // default trigger (the HealthStateSpec pattern): with an event-time
    // timeout, batches fire on data, so processAllAvailable terminates
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(qname).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def batchFace(evs: Seq[SeqStream.Ev]): Set[(Long, Long, Long)] =
    graft.ops.EventSeq.matchContiguous(
        evs.map(e => (e.entity, e.ts, e.tie, e.typ))
          .toDF("entity", "ts", "tie", "typ"),
        "entity", "ts", "tie", "typ", steps, gapUs)
      .selectExpr("entity", "unix_micros(start_ts)", "unix_micros(end_ts)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("stream == batch, including a match spanning the batch boundary") {
    val b1 = Seq(SeqStream.Ev(1L, ts(10), 1, "a"), SeqStream.Ev(1L, ts(20), 2, "b"),
      SeqStream.Ev(2L, ts(10), 3, "a"))
    val b2 = Seq(SeqStream.Ev(1L, ts(30), 4, "c"), // completes 1's episode
      SeqStream.Ev(2L, ts(15), 5, "b"), SeqStream.Ev(2L, ts(200), 6, "c")) // gap too big
    val streamed = runStream(Seq(b1, b2))
    val batch = batchFace(b1 ++ b2)
    assert(streamed === batch)
    assert(streamed === Set((1L, 10000000L, 30000000L)))
  }

  test("matches emit in the batch where they complete, not later") {
    val b1 = Seq(SeqStream.Ev(1L, ts(1), 1, "a"), SeqStream.Ev(1L, ts(2), 2, "b"),
      SeqStream.Ev(1L, ts(3), 3, "c"))
    val b2 = Seq(SeqStream.Ev(1L, ts(100), 4, "x"))
    // first batch alone already yields the match
    assert(runStream(Seq(b1)) === Set((1L, 1000000L, 3000000L)))
    assert(runStream(Seq(b1, b2)) === Set((1L, 1000000L, 3000000L)))
  }

  test("an interrupting event in a later batch breaks contiguity") {
    val b1 = Seq(SeqStream.Ev(1L, ts(1), 1, "a"), SeqStream.Ev(1L, ts(2), 2, "b"))
    val b2 = Seq(SeqStream.Ev(1L, ts(3), 3, "x"), SeqStream.Ev(1L, ts(4), 4, "c"))
    assert(runStream(Seq(b1, b2)).isEmpty)
    assert(batchFace(b1 ++ b2).isEmpty)
  }

  test("overlapping and repeated episodes across many tiny batches") {
    val evs = (0 until 9).map { i =>
      SeqStream.Ev(7L, ts(10 + i), i.toLong, Seq("a", "b", "c")(i % 3))
    }
    val streamed = runStream(evs.grouped(2).toSeq)
    assert(streamed === batchFace(evs))
    assert(streamed.size === 3)
  }
}
