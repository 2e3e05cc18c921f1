package graft.tools

import org.apache.spark.sql.SparkSession

/** Formatted-plan dump for any registered query — the plan-audit loop's
  * tool face: `.explain("formatted")` for each named query so scan
  * pruning (ReadSchema/PushedFilters), join strategies, and
  * WholeStageCodegen spans can be eyeballed without writing a scratch
  * main each time. Not part of the library surface; run manually:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PlanDump q_a,q_b"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // same extensions as Bench/Verify: without them the warehouse
      // queries plan without the sharded-DISTINCT rewrite and the dump
      // would show a shape the driver never runs
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
