package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random positive values (no Random: reproducible)
  private def vals(n: Int, key: String): Seq[(String, Int, Double)] =
    (1 to n).map { i =>
      val h = ((i * 2654435761L + key.hashCode) & 0x7fffffff) % 100000
      (key, i % 7, 0.01 + h / 100.0) // 0.01 .. ~1000.01, day = i % 7
    }

  private def df(rows: Seq[(String, Int, Double)]) =
    rows.toDF("k", "day", "v")

  test("estimates are within the guaranteed relative error of exact") {
    val rows = vals(5000, "a") ++ vals(3000, "b")
    val sk = Quantiles.sketch(df(rows), Seq("k"), "v")
    val est = Quantiles.estimate(sk, Seq("k"),
      Seq(("p50_x200", 1, 2), ("p95_x200", 19, 20)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3))).toMap

    for ((k, group) <- rows.groupBy(_._1)) {
      val sorted = group.map(_._3).sorted
      def exact(num: Int, den: Int): Double =
        sorted((num.toLong * sorted.size + den - 1).toInt / den - 1)
      val (p50, p95) = est(k)
      // rep_x200 / 200 = estimated value in original units; buckets are
      // two leading centi-digits → ≤ 5% relative half-width for v ≥ 0.10
      assert(math.abs(p50 / 200.0 - exact(1, 2)) <= 0.05 * exact(1, 2) + 0.005,
        s"$k p50 ${p50 / 200.0} vs ${exact(1, 2)}")
      assert(math.abs(p95 / 200.0 - exact(19, 20)) <= 0.05 * exact(19, 20) + 0.005,
        s"$k p95 ${p95 / 200.0} vs ${exact(19, 20)}")
    }
  }

  test("rollup of per-day sketches equals the direct sketch exactly") {
    val rows = vals(4000, "a")
    val daily = Quantiles.sketch(df(rows), Seq("k", "day"), "v")
    val merged = Quantiles.rollup(daily, Seq("k"))
      .select(col("k"), col("qd"), col("qlead"), col("cnt").cast("long"))
    val direct = Quantiles.sketch(df(rows), Seq("k"), "v")
      .select(col("k"), col("qd"), col("qlead"), col("cnt").cast("long"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("estimate is identical whether computed from daily rollup or raw") {
    val rows = vals(4000, "a") ++ vals(100, "b")
    val viaDaily = Quantiles.estimate(
      Quantiles.rollup(Quantiles.sketch(df(rows), Seq("k", "day"), "v"),
        Seq("k")), Seq("k"), Seq(("p90_x200", 9, 10)))
    val viaRaw = Quantiles.estimate(
      Quantiles.sketch(df(rows), Seq("k"), "v"),
      Seq("k"), Seq(("p90_x200", 9, 10)))
    assert(viaDaily.exceptAll(viaRaw).isEmpty &&
      viaRaw.exceptAll(viaDaily).isEmpty)
  }

  test("non-positive and null values are excluded from the sketch") {
    val d = Seq(("a", 1, 5.0), ("a", 1, 0.0), ("a", 1, -3.0))
      .toDF("k", "day", "v")
      .unionAll(Seq(("a", 1)).toDF("k", "day")
        .withColumn("v", lit(null).cast("double")))
    val sk = Quantiles.sketch(d, Seq("k"), "v")
    assert(sk.agg(sum("cnt")).collect().head.getLong(0) === 1L)
  }

  test("bucket arithmetic: known values land in the documented buckets") {
    // v=0.05 → m=5   → (qd 1, lead 5,  rep_x200 11   → 0.055)
    // v=1.23 → m=123 → (qd 3, lead 12, rep_x200 250  → 1.25)
    // v=456.789 → m=45678 → (qd 5, lead 45, rep_x200 91000 → 455.0)
    val d = Seq(("a", 1, 0.05), ("b", 1, 1.23), ("c", 1, 456.789))
      .toDF("k", "day", "v")
    val est = Quantiles.estimate(Quantiles.sketch(d, Seq("k"), "v"),
      Seq("k"), Seq(("p50_x200", 1, 2)))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(est === Map("a" -> 11L, "b" -> 250L, "c" -> 91000L))
  }
}
