package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: execute named SparkEntry queries and print the final
  * (post-AQE) physical plan plus a shuffle/scan/reuse summary — the
  * plan-audit loop behind PERF.md, runnable without a test cycle:
  * `sbt "runMain graft.PlanProbe <sfDir> q1,q2[,--full]"`. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").filterNot(_ == "--full")
    val full = args.contains("--full") || args(1).contains("--full")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      // time CONSTRUCTION too: operators with eager materialization
      // (Components rounds, ngram shingle checkpoint, IVF build) run
      // jobs before the returned frame ever executes — Bench pays them,
      // so this probe must as well
      val q = SparkEntry.queries(n)(spark, sfDir)
      // execute q's OWN QueryExecution (a ds.count() would build a new
      // derived plan and leave q's AQE plan unexecuted — reuse/shuffle
      // counts would then read the never-finalized initial plan)
      q.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val p = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      println(f"### $n%s ${sec}%.2fs " +
        s"reused=${"ReusedExchange".r.findAllIn(p).size} " +
        s"exchange=${"Exchange hashpartitioning".r.findAllIn(p).size} " +
        s"scans=${"Scan parquet".r.findAllIn(p).size} " +
        s"generate=${"Generate explode".r.findAllIn(p).size} " +
        s"aqeShuffleReads=${"AQEShuffleRead".r.findAllIn(p).size}")
      if (full) println(p)
    }
    spark.stop()
  }
}
