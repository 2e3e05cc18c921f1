package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B probe adjudicating the round-7 q_label_prop drift
  * (1.08 → 1.98 s in the full-corpus bench, code untouched): times the
  * FULL q_label_prop pipeline — quarter-sampled co-purchase pairs into
  * 2-round label propagation — with the pre-e488569 HOF pair expansion
  * vs the current chained-generator expansion, interleaved min-of-3 in
  * one JVM, so the two candidate explanations separate: a real
  * regression from the expansion change would show gen ≫ hof here;
  * host drift shows both ≈ equal. Not part of the library surface:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.LpProbe"
  */
object LpProbe {
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

    def sets: DataFrame = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .filter(col("l_partkey") % 4 === 0)
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      .groupBy(col("b")).agg(sort_array(collect_set(col("i"))).as("is"))

    // pre-e488569 expansion: interpreted HOFs, per-row pair materialization
    def viaHof(s: DataFrame): DataFrame = s
      .select(explode(expr(
        """flatten(transform(is, (x, j) ->
          |  transform(slice(is, j + 2, size(is)), y -> struct(x AS u, y AS v))))"""
          .stripMargin)).as("p"))
      .select(col("p.u"), col("p.v"))

    // current expansion: two chained codegen generators
    def viaGen(s: DataFrame): DataFrame = s
      .select(col("is"), posexplode(col("is")))
      .select(col("col").as("u"),
        explode(slice(col("is"), col("pos") + lit(2),
          size(col("is")) - col("pos") - lit(1))).as("v"))

    def lp(pairs: DataFrame): Long =
      graft.ext.LabelProp.propagate(pairs, "u", "v", rounds = 2).count()

    // parity: same label assignment under both expansions
    val a = graft.ext.LabelProp.propagate(viaHof(sets), "u", "v", 2)
      .agg(count(lit(1)), sum(col("node") * col("label"))).collect()(0).toSeq
    val b = graft.ext.LabelProp.propagate(viaGen(sets), "u", "v", 2)
      .agg(count(lit(1)), sum(col("node") * col("label"))).collect()(0).toSeq
    println(s"[lpprobe] parity hof=$a gen=$b equal=${a == b}")

    // interleaved min-of-3 so slow-host windows hit both variants alike
    val times = collection.mutable.Map("hof" -> List.empty[Double],
      "gen" -> List.empty[Double])
    (1 to 3).foreach { pass =>
      Seq("hof" -> (() => lp(viaHof(sets))),
          "gen" -> (() => lp(viaGen(sets)))).foreach { case (name, run) =>
        val t0 = System.nanoTime()
        val n = run()
        val s = (System.nanoTime() - t0) / 1e9
        times(name) = times(name) :+ s
        println(f"[lpprobe] lp/$name pass$pass: $s%6.2f s  rows=$n")
      }
    }
    times.toSeq.sortBy(_._1).foreach { case (name, ts) =>
      println(f"[lpprobe] lp/$name min=${ts.min}%6.2f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
