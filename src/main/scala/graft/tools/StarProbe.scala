package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch A/B probe for the large-star/small-star round structure
  * (`Components.starFrom`): the current round dedups the large-star
  * output (`afterLarge.distinct()`) before the small-star phase — one
  * extra shuffle per round — versus letting small-star's own groupBy +
  * final distinct absorb the duplicates at the cost of a fatter join.
  * Both variants run the FULL adaptive pipeline shape on the
  * q_components_adaptive deep-chain graph, back-to-back in one JVM,
  * labels hash-checked equal. Not part of the library surface:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StarProbe"
  */
object StarProbe {
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

    def checkpointRdd(df: DataFrame) =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }

    def edges: DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      graft.model.Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("nxt", lead(col("event_id"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("event_id").cast("long").as("a"),
          col("nxt").cast("long").as("b"))
    }

    // starFrom replicated with the intermediate distinct togglable
    def star(dedupAfterLarge: Boolean): (Long, Long, Int) = {
      val base = edges.localCheckpoint()
      val nodes = base
        .select(explode(array(col("a"), col("b"))).as("node"))
        .distinct().localCheckpoint()
      var cur = base.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct().localCheckpoint()
      var curCount = cur.count()
      var round = 0
      var converged = curCount == 0L
      while (!converged && round < 30) {
        val sym = cur.select(explode(array(
            struct(col("a"), col("b").as("nb")),
            struct(col("b").as("a"), col("a").as("nb")))).as("e"))
          .select(col("e.a").as("u"), col("e.nb").as("v"))
        val lsMins = sym.groupBy(col("u"))
          .agg(least(col("u"), min(col("v"))).as("m"))
        val afterLarge0 = sym.join(lsMins, Seq("u"))
          .filter(col("v") > col("u"))
          .select(col("v").as("big"), col("m").as("small"))
        val afterLarge =
          if (dedupAfterLarge) afterLarge0.distinct() else afterLarge0
        val ssMins = afterLarge.groupBy(col("big"))
          .agg(min(col("small")).as("m"))
        val next = afterLarge.join(ssMins, Seq("big"))
          .select(explode(array(
            struct(col("small").as("x"), col("m")),
            struct(col("big").as("x"), col("m")))).as("e"))
          .select(col("e.x").as("b"), col("e.m").as("a"))
          .filter(col("b") =!= col("a"))
          .distinct().localCheckpoint()
        val nextCount = next.count()
        converged = nextCount == curCount &&
          next.exceptAll(cur.select(col("a"), col("b"))
            .select(col("b"), col("a"))).limit(1).count() == 0L
        checkpointRdd(cur).foreach(_.unpersist(false))
        cur = next.select(col("a"), col("b"))
        curCount = nextCount
        round += 1
      }
      require(converged, "did not converge")
      val labels = nodes.join(
        cur.groupBy(col("b").as("node")).agg(min(col("a")).as("root")),
          Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("root"), col("node")).as("component"))
      val r = labels.agg(count(lit(1)),
        sum(hash(col("node"), col("component")).cast("long"))).head()
      val out = (r.getLong(0), r.getLong(1), round)
      checkpointRdd(nodes).foreach(_.unpersist(false))
      checkpointRdd(cur).foreach(_.unpersist(false))
      out
    }

    (1 to 3).foreach { pass =>
      def time(label: String)(f: => (Long, Long, Int)): (Long, Long, Int) = {
        val t0 = System.nanoTime()
        val out = f
        println(f"[starprobe] $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=${out._1} hash=${out._2} rounds=${out._3})")
        out
      }
      val a = time(s"dedup/$pass")(star(dedupAfterLarge = true))
      val b = time(s"nodedup/$pass")(star(dedupAfterLarge = false))
      require(a._1 == b._1 && a._2 == b._2, s"label divergence: $a vs $b")
    }
    spark.stop()
  }
}
