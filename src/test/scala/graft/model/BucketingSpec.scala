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
}
