package graft.model

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed-layout contract: a join of two tables bucketed on the join
  * key with matching bucket counts must plan with ZERO exchanges beneath
  * the join — the layout carries the partitioning. This is asserted with
  * broadcast disabled, so the only thing that can avoid the shuffle IS
  * the bucket metadata.
  */
class BucketingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("same-key same-count bucketed tables join with zero exchanges") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = Files.createTempDirectory("bucketing").toString
      Bucketing.writeBucketed(
        spark.read.parquet(s"$sfDir/orders.parquet"),
        "spec_b_orders", s"$dir/orders", "o_orderkey", buckets = 4)
      Bucketing.writeBucketed(
        spark.read.parquet(s"$sfDir/lineitem.parquet"),
        "spec_b_lineitem", s"$dir/lineitem", "l_orderkey", buckets = 4)

      val j = Bucketing.table(spark, "spec_b_lineitem")
        .join(Bucketing.table(spark, "spec_b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      val rows = j.collect()
      assert(rows.nonEmpty)

      val p = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the one permitted exchange is the post-join aggregation on
      // o_orderstatus; the join itself must inherit the bucket layout
      val exchanges = "Exchange hashpartitioning\\(([^)]*)\\)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      assert(p.contains("SortMergeJoin"), p.take(400))
      assert(exchanges.length == 1 &&
        exchanges.head.contains("o_orderstatus"),
        s"join shuffled despite bucket layout: ${exchanges.mkString("; ")}")
      assert(!exchanges.exists(e =>
        e.contains("l_orderkey") || e.contains("o_orderkey")),
        s"bucketed key still exchanged: ${exchanges.mkString("; ")}")

      // correctness: identical to the plain (shuffling) parquet join
      val plain = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .join(spark.read.parquet(s"$sfDir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
        .collect()
      assert(rows.map(_.toString).sorted.toSeq ==
        plain.map(_.toString).sorted.toSeq)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS spec_b_orders")
      spark.sql("DROP TABLE IF EXISTS spec_b_lineitem")
    }
  }

  test("failed rewrite leaves the previous registration serving (stage-and-swap)") {
    // ADVICE r9: the old drop-then-write form lost the live table when
    // the write failed. Now the write stages under a temp name and only
    // swaps on success — a failing rewrite must leave readers untouched.
    val dir = Files.createTempDirectory("bucketing-swap").toString
    try {
      Bucketing.writeBucketed(
        spark.read.parquet(s"$sfDir/region.parquet"),
        "spec_b_swap", s"$dir/t", "r_regionkey", buckets = 2)
      val before = Bucketing.table(spark, "spec_b_swap").count()
      assert(before > 0)

      // evaluation of this frame throws mid-write (division by zero is
      // ANSI-fatal in Spark 4)
      val poison = spark.read.parquet(s"$sfDir/region.parquet")
        .withColumn("boom", expr("r_regionkey / 0"))
      intercept[Exception] {
        Bucketing.writeBucketed(poison, "spec_b_swap", s"$dir/t",
          "r_regionkey", buckets = 2)
      }

      // live registration still serves the previous layout
      assert(Bucketing.table(spark, "spec_b_swap").count() == before)
      // no staging table left behind
      assert(!spark.catalog.listTables()
        .collect().exists(_.name.startsWith("spec_b_swap_staging")))

      // a successful rewrite swaps in AND reclaims the superseded version
      Bucketing.writeBucketed(
        spark.read.parquet(s"$sfDir/region.parquet").limit(3),
        "spec_b_swap", s"$dir/t", "r_regionkey", buckets = 2)
      assert(Bucketing.table(spark, "spec_b_swap").count() == 3)
      val versions = new java.io.File(s"$dir/t").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v_"))
      assert(versions.length == 1, versions.map(_.getName).mkString(","))
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_b_swap")
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("spec_b_swap_staging"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    }
  }
}
