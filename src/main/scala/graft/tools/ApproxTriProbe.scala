package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement probe for the DOULION approximate triangle counter —
  * (a) estimate-vs-exact relative error at each SF (to set the
  * q_triangles_approx tolerance with margin), (b) exact-vs-approx
  * wall-time in the SAME JVM min-of-3 (the PERF.md adjudication
  * discipline). Not library surface; run manually:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ApproxTriProbe"
  */
object ApproxTriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def li: DataFrame = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))

    def edgesOf(df: DataFrame): DataFrame =
      graft.ext.Basket.coPairs(df, "l_orderkey", "l_partkey")

    def globalOf(perNode: DataFrame, c: String): Double =
      perNode.agg((sum(col(c)) / 3.0).as("t")).collect()(0).getDouble(0)

    // accuracy: full graph and the half (even-part) graph, p = 1/2 and 3/4
    for ((name, filtered) <- Seq(
        "full" -> li,
        "half" -> li.where(col("l_partkey") % 2 === 0))) {
      val e = edgesOf(filtered).localCheckpoint()
      val exact = globalOf(graft.ext.Triangles.perNode(e, "u", "v"), "n_tri")
      for ((kb, b) <- Seq(8 -> 16, 12 -> 16, 4 -> 16)) {
        val est = globalOf(
          graft.ext.Triangles.approxPerNode(e, "u", "v", kb, b), "n_tri_est")
        val err = math.abs(est - exact) / exact
        println(f"ACC $name p=$kb/$b exact=$exact%.0f est=$est%.1f relerr=$err%.4f")
      }
    }

    // wall-time, same JVM, min-of-3 each (exact first, then approx)
    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name min=${ts.min}%.2f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("exact full")(graft.ext.Triangles.perNode(edgesOf(li), "u", "v"))
    time("approx full p=1/2")(
      graft.ext.Triangles.approxPerNode(edgesOf(li), "u", "v", 8, 16))
    time("approx full p=1/4")(
      graft.ext.Triangles.approxPerNode(edgesOf(li), "u", "v", 4, 16))

    spark.stop()
  }
}
