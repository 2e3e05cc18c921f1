package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for the q_image_phash tolerance bound: the pHash
  * Hamming distance distribution over the dHash near-dup fixture pairs
  * (shift members vs flip members), at the given SF dir — the evidence
  * behind the pinned agreement threshold. Not part of the library
  * surface; run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PhashProbe"
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fps = graft.SparkEntry.imageDedupFpsForProbe(spark, sfDir)
      .localCheckpoint()
    val pairs = graft.ext.ImageHash.nearDupPairs(fps, "dhash",
      maxHamming = 3)
    val withPh = pairs
      .join(fps.select(col("media_id").as("doc_a"),
        col("phash").as("ph_a")), Seq("doc_a"))
      .join(fps.select(col("media_id").as("doc_b"),
        col("phash").as("ph_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("hamming").as("dh"),
        expr("bit_count(ph_a ^ ph_b)").as("ph"))
    println("=== pHash hamming by dHash hamming ===")
    withPh.groupBy(col("dh"))
      .agg(count(lit(1)).as("n"), min(col("ph")).as("ph_min"),
        expr("percentile(ph, 0.5)").as("ph_med"),
        max(col("ph")).as("ph_max"))
      .orderBy(col("dh")).show(20, truncate = false)
    spark.stop()
  }
}
