package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage decomposition (optimization guide §1: decide
  * whether a query's wall is executor compute, shuffle, or fixed
  * per-job scheduling overhead BEFORE touching its plan). For each
  * named query: one untimed warm-up pass, then one timed pass with a
  * listener totting up jobs, stages, tasks, summed executor run time,
  * and shuffle bytes. wall ≫ taskTime/cores with a large job count =
  * scheduling/latency-bound (fewer rounds/checkpoints is the lever);
  * taskTime/cores ≈ wall = compute-bound (per-task work is the lever);
  * large shuffle bytes = exchange-bound (guide §2). Not part of the
  * library surface; run manually:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JobProbe q_a,q_b"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names =
      if (args.nonEmpty) args(0).split(",").map(_.trim).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val runMs = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    // listener events are async: settle until the counters stop moving
    def settle(): Unit = {
      var prev = -1L
      var cur = jobs.get.toLong + stages.get + tasks.get + runMs.get
      while (prev != cur) {
        prev = cur; Thread.sleep(200L)
        cur = jobs.get.toLong + stages.get + tasks.get + runMs.get
      }
    }
    println("query,wall_s,jobs,stages,tasks,task_run_s,shuf_write_mb,shuf_read_mb")
    // warm-up count: 1 matches the historical probe; larger values
    // (e.g. 3) reach the bench's min-of-3 JIT steady state, which
    // matters when adjudicating compute- vs overhead-bound at bigger
    // SFs — a single warm-up leaves hot codegen loops C1-compiled and
    // overstates task_run_s several-fold (measured ×5 on q_triangles
    // at sf1)
    val warmups = sys.env.get("SPARK_GRAFT_PROBE_WARMUPS")
      .map(_.toInt).getOrElse(1)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to warmups).foreach { _ =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
      settle()
      jobs.set(0); stages.set(0); tasks.set(0)
      runMs.set(0L); shufWrite.set(0L); shufRead.set(0L)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      val wall = (System.nanoTime() - t0) / 1e9
      settle()
      println(f"$n${if (ok) "" else "(FAILED)"},$wall%.3f,${jobs.get}," +
        f"${stages.get},${tasks.get},${runMs.get / 1e3}%.2f," +
        f"${shufWrite.get / 1048576.0}%.1f,${shufRead.get / 1048576.0}%.1f")
    }
    spark.stop()
  }
}
