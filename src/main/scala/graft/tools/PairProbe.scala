package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B probe for the in-row basket pair expansion — the nested
  * `flatten(transform(..., transform(slice(...))))` HOF form (interpreted:
  * HOFs never enter whole-stage codegen, and the flatten materializes all
  * C(k,2) pair structs per basket row before exploding) vs a chained
  * two-generator form (`posexplode` then `explode(slice(...))` — both
  * Generate nodes codegen and stream). Times the expansion alone and the
  * full q_triangles pipeline per variant back-to-back in one JVM. Not part
  * of the library surface; run manually:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PairProbe"
  */
object PairProbe {
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
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      .groupBy(col("b")).agg(sort_array(collect_set(col("i"))).as("is"))

    def viaHof(s: DataFrame): DataFrame = s
      .select(explode(expr(
        """flatten(transform(is, (x, j) ->
          |  transform(slice(is, j + 2, size(is)), y -> struct(x AS u, y AS v))))"""
          .stripMargin)).as("p"))
      .select(col("p.u"), col("p.v"))

    def viaGen(s: DataFrame): DataFrame = s
      .select(col("is"), posexplode(col("is")))
      .select(col("col").as("u"),
        explode(slice(col("is"), col("pos") + lit(2),
          size(col("is")) - col("pos") - lit(1))).as("v"))

    def time(name: String)(mk: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = mk
        println(f"[pairprobe] $name pass$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      }

    // parity first: identical pair multisets
    val h1 = viaHof(sets).groupBy().agg(count(lit(1)), sum(col("u") * col("v")))
      .collect()(0).toSeq
    val h2 = viaGen(sets).groupBy().agg(count(lit(1)), sum(col("u") * col("v")))
      .collect()(0).toSeq
    println(s"[pairprobe] parity hof=$h1 gen=$h2 equal=${h1 == h2}")

    time("expand/hof")(viaHof(sets).count())
    time("expand/gen")(viaGen(sets).count())
    time("tri/hof")(graft.ext.Triangles.perNode(viaHof(sets), "u", "v").count())
    time("tri/gen")(graft.ext.Triangles.perNode(viaGen(sets), "u", "v").count())
    spark.stop()
  }
}
