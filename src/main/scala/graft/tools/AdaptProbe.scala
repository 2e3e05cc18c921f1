package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch A/B probe: `Components.connectedAdaptive` with and without the
  * plateau abort, on the exact deep-chain graph q_components_adaptive
  * builds (per-user event-succession chains, diameter 49–86 at sf0.1 —
  * the worst case for min-label). Both variants run back-to-back in ONE
  * JVM, several passes, so host contention can't masquerade as the
  * algorithmic difference; labels are cross-checked for equality each
  * pass. Not part of the library surface; run manually:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.AdaptProbe"
  */
object AdaptProbe {
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

    def edges: DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      graft.model.Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("nxt", lead(col("event_id"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("event_id").as("src"), col("nxt").as("dst"))
    }

    def labelsHash(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(hash(col("node"), col("component")).cast("long"))).head()
      (r.getLong(0), r.getLong(1))
    }

    (1 to 3).foreach { pass =>
      def time(label: String)(f: => (Long, Long)): (Long, Long) = {
        val t0 = System.nanoTime()
        val out = f
        println(f"[adaptprobe] $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=${out._1} hash=${out._2})")
        out
      }
      val a = time(s"full-budget/$pass") {
        labelsHash(graft.ext.Components.connectedAdaptive(
          edges, "src", "dst", minLabelRounds = 8, plateauAbort = false))
      }
      val b = time(s"plateau/$pass") {
        labelsHash(graft.ext.Components.connectedAdaptive(
          edges, "src", "dst", minLabelRounds = 8, plateauAbort = true))
      }
      require(a == b, s"label divergence: $a vs $b")
    }
    spark.stop()
  }
}
