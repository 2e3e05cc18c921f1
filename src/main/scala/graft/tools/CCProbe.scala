package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch A/B probe: min-label propagation (`Components.connected`) vs
  * large-star/small-star contraction (`Components.connectedStar`) on the
  * exact pair graph q_dedup_clusters builds (minhash-LSH near-dup pairs
  * over `documents`). Both variants run back-to-back, twice each, in one
  * JVM so host contention noise can't masquerade as an algorithmic
  * difference. Not part of the library surface; run manually:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.CCProbe"
  */
object CCProbe {
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

    def pairs: DataFrame = graft.ext.Dedup.minhashLshPairs(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
      shingleN = 3, numHashes = 12, bandSize = 4, threshold = 0.5,
      broadcastCandidates = true)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ccprobe] $label%-10s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }

    (1 to 2).foreach { pass =>
      time(s"minlabel/$pass") {
        graft.ext.Components.connected(pairs, "doc_a", "doc_b").count()
      }
      time(s"star/$pass") {
        graft.ext.Components.connectedStar(pairs, "doc_a", "doc_b").count()
      }
    }
    spark.stop()
  }
}
