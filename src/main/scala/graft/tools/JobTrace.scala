package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-JOB trace for one query: call site, wall, and task count of
  * every Spark job the query submits, in submission order — the
  * companion to [[JobProbe]]'s totals when the question is WHICH legs
  * of a job-bound chain spend the jobs (optimization guide §1: decide
  * before touching the plan). Warm-up count via
  * SPARK_GRAFT_PROBE_WARMUPS like JobProbe. Not part of the library
  * surface; run manually:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JobTrace q_x"
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    require(args.nonEmpty, "usage: JobTrace <query>[,<query>...]")
    val names = args(0).split(",").map(_.trim).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = TrieMap.empty[Int, (Long, String, Int)]
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .filter(_.nonEmpty)
          .orElse(j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?") +
          " | " + j.stageInfos.map(_.name.takeWhile(_ != '\n'))
            .mkString(" <- ")
        starts.put(j.jobId,
          (System.nanoTime(), site, j.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site, nTasks) =>
          lines.add(f"job=${j.jobId}%4d  ${(System.nanoTime() - t0) / 1e3}%9.0f us  " +
            f"tasks=$nTasks%4d  $site")
        }
      // per-stage max task run time: tells an under-split compute stage
      // (max ≈ median, wall = tasks/cores waves) from a skewed one
      // (max ≫ median)
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          lines.add(f"  task stage=${t.stageId}%4d run=" +
            f"${t.taskMetrics.executorRunTime}%6d ms")
    })
    val warmups = sys.env.get("SPARK_GRAFT_PROBE_WARMUPS")
      .map(_.toInt).getOrElse(1)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to warmups).foreach { _ =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
      Thread.sleep(500L)
      lines.clear()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500L)
      val nJobs = lines.stream().filter(_.startsWith("job=")).count()
      println(s"===== $n wall=$wall s jobs=$nJobs =====")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
