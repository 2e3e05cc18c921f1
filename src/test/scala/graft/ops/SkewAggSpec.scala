package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewAggSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase agg equals plain groupBy, for a skewed key") {
    // hot key "k0" holds 90% of rows
    val rows = (1 to 900).map(i => ("k0", i.toLong, i * 0.5)) ++
      (1 to 100).map(i => (s"k${i % 7 + 1}", i.toLong, i * 2.0))
    val df = rows.toDF("key", "row_id", "v")

    val plain = df.groupBy($"key")
      .agg(sum($"v".cast("decimal(18,2)")).as("total"), count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq

    val salted = SkewAgg.saltedSum(df, Seq("key"), distributor = $"row_id",
      saltBuckets = 8,
      sums = Map("total" -> $"v".cast("decimal(18,2)")), counts = Seq("n"))
      .select($"key", $"total", $"n")
      .collect().map(_.toString).sorted.toSeq

    assert(salted == plain)
  }

  test("deterministic: same input twice → identical output") {
    val df = (1 to 50).map(i => ("k", i.toLong, 1.0)).toDF("key", "row_id", "v")
    def run() = SkewAgg.saltedSum(df, Seq("key"), $"row_id", 4,
      Map("s" -> $"v".cast("decimal(18,2)"))).collect().map(_.toString).sorted.toSeq
    assert(run() == run())
  }
}
