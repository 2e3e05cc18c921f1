package graft.streaming

import graft.SparkSpec
import graft.ext.Quantiles
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private def rows(lo: Int, hi: Int): Seq[(String, Double)] =
    (lo to hi).map(i => (if (i % 3 == 0) "a" else "b",
      0.01 + ((i * 2654435761L) & 0x7fffffff) % 50000 / 100.0))

  test("stream-maintained sketch ≡ batch sketch over all events seen") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sketch").toString + "/sk"
    val mem = MemoryStream[(String, Double)]
    val q = SketchStream.maintain(mem.toDF().toDF("k", "v"), Seq("k"), "v",
      dir, trigger = Trigger.ProcessingTime("0 seconds")).start()
    val (b0, b1) = (rows(1, 800), rows(801, 2000))
    try {
      mem.addData(b0: _*)
      q.processAllAvailable()
      mem.addData(b1: _*)
      q.processAllAvailable()
    } finally q.stop()

    // merged stream state == one batch sketch over the union, bit-exact
    val streamed = Quantiles.rollup(spark.read.parquet(dir), Seq("k"))
      .select(col("k"), col("qd"), col("qlead"), col("cnt").cast("long"))
    val direct = Quantiles.sketch((b0 ++ b1).toDF("k", "v"), Seq("k"), "v")
      .select(col("k"), col("qd"), col("qlead"), col("cnt").cast("long"))
    assert(streamed.exceptAll(direct).isEmpty &&
      direct.exceptAll(streamed).isEmpty)

    // and the serving read agrees with the batch estimate path
    val est = SketchStream.quantiles(spark, dir, Seq("k"),
      Seq(("p50_x200", 1, 2), ("p95_x200", 19, 20)))
    val twin = Quantiles.estimate(
      Quantiles.sketch((b0 ++ b1).toDF("k", "v"), Seq("k"), "v"),
      Seq("k"), Seq(("p50_x200", 1, 2), ("p95_x200", 19, 20)))
    assert(est.exceptAll(twin).isEmpty && twin.exceptAll(est).isEmpty)
  }

  test("auto-compaction + expire: one wave remains, the quantile " +
      "answers are invariant") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sketch3").toString + "/sk"
    val (b0, b1) = (rows(1, 400), rows(401, 900))
    val mem = MemoryStream[(String, Double)]
    val q = SketchStream.maintain(mem.toDF().toDF("k", "v"), Seq("k"), "v",
      dir, trigger = Trigger.ProcessingTime("0 seconds"),
      compactEvery = 2).start()
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    assert(graft.model.WaveManifest.pinned(spark, dir).get ===
      Seq(graft.model.WaveManifest.CompactBase))
    SketchStream.expire(spark, dir)
    val dirs = Option(new java.io.File(dir).listFiles()).get
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(dirs === Seq(s"batch=${graft.model.WaveManifest.CompactBase}"))
    val est = SketchStream.quantiles(spark, dir, Seq("k"),
      Seq(("p50_x200", 1, 2)))
    val twin = Quantiles.estimate(
      Quantiles.sketch((b0 ++ b1).toDF("k", "v"), Seq("k"), "v"),
      Seq("k"), Seq(("p50_x200", 1, 2)))
    assert(est.exceptAll(twin).isEmpty && twin.exceptAll(est).isEmpty)
  }

  test("replayed batch overwrites its own partition; a FRESH second " +
      "stream accumulates instead of clobbering") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sketch2").toString + "/sk"
    val data = rows(1, 500)

    // run batch 0 once via the stream...
    val mem = MemoryStream[(String, Double)]
    val q = SketchStream.maintain(mem.toDF().toDF("k", "v"), Seq("k"), "v",
      dir, trigger = Trigger.ProcessingTime("0 seconds")).start()
    try { mem.addData(data: _*); q.processAllAvailable() } finally q.stop()
    val once = Quantiles.rollup(spark.read.parquet(dir), Seq("k"))
      .orderBy("k", "qd", "qlead").collect()

    // an at-least-once retry of the SAME effective batch re-lands its
    // own dir with identical content (the sketch is a pure function of
    // the batch) — a no-op for the rollup
    Quantiles.sketch(data.toDF("k", "v"), Seq("k"), "v")
      .write.mode("overwrite").parquet(s"$dir/batch=0")
    val twice = Quantiles.rollup(spark.read.parquet(dir), Seq("k"))
      .orderBy("k", "qd", "qlead").collect()
    assert(once.toSeq == twice.toSeq)

    // a FRESH second stream is NOT a replay: its epoch ids restart at 0
    // but its batches are NEW events — the run-scoped base must land
    // them under a new dir so the store accumulates, never clobbers
    val extra = rows(501, 900)
    val mem2 = MemoryStream[(String, Double)]
    val q2 = SketchStream.maintain(mem2.toDF().toDF("k", "v"), Seq("k"), "v",
      dir, trigger = Trigger.ProcessingTime("0 seconds")).start()
    try { mem2.addData(extra: _*); q2.processAllAvailable() } finally q2.stop()
    val streamed = Quantiles.rollup(spark.read.parquet(dir), Seq("k"))
      .select(col("k"), col("qd"), col("qlead"), col("cnt").cast("long"))
    val direct = Quantiles.sketch((data ++ extra).toDF("k", "v"),
        Seq("k"), "v")
      .select(col("k"), col("qd"), col("qlead"), col("cnt").cast("long"))
    assert(streamed.exceptAll(direct).isEmpty &&
      direct.exceptAll(streamed).isEmpty)
  }
}
