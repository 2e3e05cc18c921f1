package graft.streaming

import graft.SparkSpec
import graft.ext.CountMin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class CountMinStreamSpec extends SparkSpec {
  import spark.implicits._

  private def cellsOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("i").cast("int"), col("j").cast("long"),
        col("cnt").cast("long"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .toMap

  test("stream-maintained sketch ≡ one-shot batch sketch, and the " +
      "served estimates match the batch estimate face") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cm").toString + "/cm"
    val mem = MemoryStream[String]
    val q = CountMinStream.maintain(mem.toDF().toDF("k"), "k", dir,
      d = 3, w = 32, trigger = Trigger.ProcessingTime("0 seconds")).start()
    val b0 = (1 to 300).map(i => s"k${i % 11}")
    val b1 = (1 to 200).map(i => s"k${i % 7}")
    try {
      mem.addData(b0: _*)
      q.processAllAvailable()
      mem.addData(b1: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = cellsOf(CountMinStream.rollup(spark, dir))
    val direct = cellsOf(CountMin.sketch((b0 ++ b1).toDF("k"), "k",
      d = 3, w = 32))
    assert(streamed === direct)

    val served = CountMinStream.estimate(spark, dir,
      (b0 ++ b1).toDF("k"), "k", d = 3, w = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twin = CountMin.estimate(CountMin.sketch((b0 ++ b1).toDF("k"),
        "k", d = 3, w = 32), (b0 ++ b1).toDF("k"), "k", d = 3, w = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(served === twin)
  }

  test("replayed batch overwrites its own partition — no double count") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cm2").toString + "/cm"
    val data = (1 to 250).map(i => s"k${i % 9}")

    val mem = MemoryStream[String]
    val q = CountMinStream.maintain(mem.toDF().toDF("k"), "k", dir,
      d = 3, w = 32, trigger = Trigger.ProcessingTime("0 seconds")).start()
    try { mem.addData(data: _*); q.processAllAvailable() } finally q.stop()
    val once = cellsOf(CountMinStream.rollup(spark, dir))

    // at-least-once retry of the SAME batch id: a fresh writer re-lands
    // batch=0 with identical input — the overwrite must be a no-op
    CountMin.sketch(data.toDF("k"), "k", d = 3, w = 32)
      .write.mode("overwrite").parquet(s"$dir/batch=0")
    val twice = cellsOf(CountMinStream.rollup(spark, dir))
    assert(once === twice)
  }

  test("auto-compaction merges cells exactly; expire leaves one dir; " +
      "a fresh run after compaction bases past the burned watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cm4").toString + "/cm"
    val b0 = (1 to 150).map(i => s"k${i % 7}")
    val b1 = (1 to 100).map(i => s"k${i % 5}")
    val b2 = (1 to 80).map(i => s"k${i % 3}")

    val m1 = MemoryStream[String]
    val q1 = CountMinStream.maintain(m1.toDF().toDF("k"), "k", dir,
      d = 2, w = 16, trigger = Trigger.ProcessingTime("0 seconds"),
      compactEvery = 2).start()
    try {
      m1.addData(b0: _*); q1.processAllAvailable()
      m1.addData(b1: _*); q1.processAllAvailable()
    } finally q1.stop()
    // batch 1 hit compactEvery=2: one compaction-space wave pinned,
    // cell-merged — the rollup answer is invariant
    assert(graft.model.WaveManifest.pinned(spark, dir).get ===
      Seq(graft.model.WaveManifest.CompactBase))
    val direct01 = cellsOf(CountMin.sketch((b0 ++ b1).toDF("k"), "k",
      d = 2, w = 16))
    assert(cellsOf(CountMinStream.rollup(spark, dir)) === direct01)
    // retention reclaims the absorbed dirs — ONE dir remains
    CountMinStream.expire(spark, dir)
    val dirs = Option(new java.io.File(dir).listFiles()).get
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(dirs ===
      Seq(s"batch=${graft.model.WaveManifest.CompactBase}"))
    assert(cellsOf(CountMinStream.rollup(spark, dir)) === direct01)
    // a FRESH run bases itself past the burned watermark and the store
    // keeps accumulating
    val m2 = MemoryStream[String]
    val q2 = CountMinStream.maintain(m2.toDF().toDF("k"), "k", dir,
      d = 2, w = 16, trigger = Trigger.ProcessingTime("0 seconds")).start()
    try { m2.addData(b2: _*); q2.processAllAvailable() } finally q2.stop()
    assert(cellsOf(CountMinStream.rollup(spark, dir)) ===
      cellsOf(CountMin.sketch((b0 ++ b1 ++ b2).toDF("k"), "k",
        d = 2, w = 16)))
  }

  test("restart from files alone: a second stream continues the store") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("cm3").toString
    val dir = root + "/cm"
    val b0 = (1 to 120).map(i => s"k${i % 5}")
    val b1 = (1 to 80).map(i => s"k${i % 6}")

    val m1 = MemoryStream[String]
    val q1 = CountMinStream.maintain(m1.toDF().toDF("k"), "k", dir,
      d = 2, w = 16, trigger = Trigger.ProcessingTime("0 seconds")).start()
    try { m1.addData(b0: _*); q1.processAllAvailable() } finally q1.stop()

    // a REAL second maintain() stream with a fresh checkpoint restarts
    // epoch ids at 0 — the run-scoped base must land its batch under a
    // NEW dir instead of clobbering the first run's batch=0 cells
    // (silently losing counts would break est ≥ true)
    val m2 = MemoryStream[String]
    val q2 = CountMinStream.maintain(m2.toDF().toDF("k"), "k", dir,
      d = 2, w = 16, trigger = Trigger.ProcessingTime("0 seconds")).start()
    try { m2.addData(b1: _*); q2.processAllAvailable() } finally q2.stop()

    val streamed = cellsOf(CountMinStream.rollup(spark, dir))
    val direct = cellsOf(CountMin.sketch((b0 ++ b1).toDF("k"), "k",
      d = 2, w = 16))
    assert(streamed === direct)
    // two distinct batch dirs on disk — nothing overwrote run 1
    val dirs = Option(new java.io.File(dir).listFiles()).get
      .map(_.getName).filter(_.startsWith("batch=")).toSeq.sorted
    assert(dirs.size == 2, dirs.toString)
  }
}
