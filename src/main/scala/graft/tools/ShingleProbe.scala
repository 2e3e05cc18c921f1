package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: how much of the dedup family's cost is the interpreted
  * shingling HOF (`transform(sequence(...), i -> concat_ws(slice(...)))`
  * runs OUTSIDE whole-stage codegen)? Stages timed separately, min-of-3,
  * one JVM:
  *   words   — split only (codegen'd)
  *   shingle — words + the HOF + explode + distinct (the shipped shape)
  *   index   — full minhashIndex (shingle + 12-hash signature agg)
  * If (shingle − words) is small relative to the index/pair stages, a
  * native codegen shingle Expression is not worth its complexity.
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ShingleProbe"
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(mk: => DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"[shingleprobe] $name%-8s pass$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      }

    time("words") {
      docs.select(col("doc_id"),
        graft.ext.TextAnalysis.words(col("text")).as("w"))
        .select(col("doc_id"), explode(col("w")).as("word"))
    }
    time("shingle") {
      graft.ext.Dedup.shingles(docs, "doc_id", "text", 3)
    }
    time("index") {
      graft.ext.Dedup.minhashIndex(docs, "doc_id", "text", 3, 12)
    }
    spark.stop()
  }
}
