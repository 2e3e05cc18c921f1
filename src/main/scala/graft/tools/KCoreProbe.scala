package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B probe for the k-core degree aggregate — `unionAll` of the
  * two endpoint projections (two scans of the edge frame) vs one scan
  * with `explode(array(a, b))`. Times the FULL q_kcore pipeline per
  * variant back-to-back in one JVM so host contention noise can't
  * masquerade as an algorithmic difference. Not part of the library
  * surface; run manually:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.KCoreProbe"
  */
object KCoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges: DataFrame = {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      graft.ext.Basket.coPairs(li, "l_orderkey", "l_partkey")
    }

    def survivors(degrees: DataFrame => DataFrame): DataFrame = {
      var e = edges.where(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b"))
        .distinct().localCheckpoint()
      (1 to 3).foreach { _ =>
        val keep = broadcast(
          degrees(e).filter(col("core_deg") >= 60).select(col("node")))
        e = e
          .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
          .localCheckpoint()
      }
      degrees(e)
    }

    val viaUnion: DataFrame => DataFrame = es => es
      .select(col("a").as("node")).unionAll(es.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))

    val viaExplode: DataFrame => DataFrame = es => es
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))

    def time(name: String)(mk: => DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"$name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
      }

    // interleave the variants so drift hits both equally
    (1 to 2).foreach { round =>
      time(s"r$round union  ")(survivors(viaUnion))
      time(s"r$round explode")(survivors(viaExplode))
    }
    spark.stop()
  }
}
