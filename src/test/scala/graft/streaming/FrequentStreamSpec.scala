package graft.streaming

import graft.SparkSpec
import graft.ext.FrequentItems
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.Trigger

/** Streaming frequent-items contracts: the stream-maintained summary
  * store must serve the SAME exact heavy hitters as a batch pass over
  * all events seen, and a replayed batch must not change the answer.
  */
class FrequentStreamSpec extends SparkSpec {
  import spark.implicits._

  // hot items with harmonic counts + unique tail, deterministic order
  private def rows(lo: Int, hi: Int): Seq[String] =
    (lo to hi).map { i =>
      val h = (i * 2654435761L) & 0x7fffffff
      if (h % 4 != 0) s"hot${h % 12}" else s"cold$i"
    }

  private def brute(items: Seq[String], shareDen: Long): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * shareDen >= n }.toMap
  }

  test("stream summaries + exact pass == batch heavy hitters over all events") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("mgstream")
      .toString + "/mg"
    val mem = MemoryStream[String]
    val q = FrequentStream.maintain(mem.toDF().toDF("item"), "item", dir,
      capacity = 256, trigger = Trigger.ProcessingTime("0 seconds")).start()
    val (b0, b1) = (rows(1, 3000), rows(3001, 8000))
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()

    val all = b0 ++ b1
    val expected = brute(all, shareDen = 60)
    assert(expected.nonEmpty)
    val got = FrequentStream.exactOver(all.toDF("item"), "item",
        shareDen = 60, spark, dir, capacity = 256)
      .as[(String, Long)].collect().toMap
    assert(got == expected)
    // and the summary store really is summary-sized: one row per batch
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("replaying a batch leaves the exact answer unchanged") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("mgreplay")
      .toString + "/mg"
    val data = rows(1, 4000)
    val mem = MemoryStream[String]
    val q = FrequentStream.maintain(mem.toDF().toDF("item"), "item", dir,
      capacity = 256, trigger = Trigger.ProcessingTime("0 seconds")).start()
    try { mem.addData(data: _*); q.processAllAvailable() } finally q.stop()

    val before = FrequentStream.exactOver(data.toDF("item"), "item",
        shareDen = 60, spark, dir, capacity = 256)
      .as[(String, Long)].collect().toMap

    // at-least-once replay: the SAME effective batch re-lands its own
    // dir (possibly a different-but-valid MG summary of the same rows)
    FrequentItems.sliceSummaries(
        data.toDF("item").withColumn("_slice", lit(1)), Seq("_slice"),
        "item", 256)
      .drop("_slice").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/batch=0")

    val after = FrequentStream.exactOver(data.toDF("item"), "item",
        shareDen = 60, spark, dir, capacity = 256)
      .as[(String, Long)].collect().toMap
    assert(after == before)
    assert(spark.read.parquet(dir).count() == 1,
      "replay must overwrite batch=0, not append a sibling")

    // a FRESH second stream is NOT a replay: its epoch ids restart at 0
    // but its items are NEW — the run-scoped base lands them under a
    // new dir and the merged candidates cover BOTH runs' heavy items
    val extra = Seq.fill(2000)("zz") ++ rows(4001, 4400)
    val mem2 = MemoryStream[String]
    val q2 = FrequentStream.maintain(mem2.toDF().toDF("item"), "item", dir,
      capacity = 256, trigger = Trigger.ProcessingTime("0 seconds")).start()
    try { mem2.addData(extra: _*); q2.processAllAvailable() } finally q2.stop()
    assert(spark.read.parquet(dir).count() == 2,
      "a fresh run must append its own batch dir, not clobber run 1's")
    val both = FrequentStream.exactOver((data ++ extra).toDF("item"),
        "item", shareDen = 60, spark, dir, capacity = 256)
      .as[(String, Long)].collect().toMap
    assert(both == brute(data ++ extra, shareDen = 60) &&
      both.keySet.contains("zz"), both.toString)
  }

  test("auto-compaction + expire: one wave remains, exact serving " +
      "unchanged") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("mgcompact")
      .toString + "/mg"
    val (b0, b1) = (rows(1, 2500), rows(2501, 6000))
    val mem = MemoryStream[String]
    val q = FrequentStream.maintain(mem.toDF().toDF("item"), "item", dir,
      capacity = 256, trigger = Trigger.ProcessingTime("0 seconds"),
      compactEvery = 2).start()
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    assert(graft.model.WaveManifest.pinned(spark, dir).get ===
      Seq(graft.model.WaveManifest.CompactBase))
    FrequentStream.expire(spark, dir)
    val dirs = Option(new java.io.File(dir).listFiles()).get
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(dirs === Seq(s"batch=${graft.model.WaveManifest.CompactBase}"))
    val all = b0 ++ b1
    val got = FrequentStream.exactOver(all.toDF("item"), "item",
        shareDen = 60, spark, dir, capacity = 256)
      .as[(String, Long)].collect().toMap
    assert(got == brute(all, shareDen = 60) && got.nonEmpty)
  }

  test("serving threshold below the cross-batch merge bound is rejected") {
    intercept[IllegalArgumentException] {
      FrequentStream.exactOver(Seq("a").toDF("item"), "item",
        shareDen = 200, spark, "/tmp/nonexistent", capacity = 256)
    }
  }
}
