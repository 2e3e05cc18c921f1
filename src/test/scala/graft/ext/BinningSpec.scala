package graft.ext

import graft.SparkSpec

class BinningSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clips to the group's rounded percentile bounds") {
    // group g: values 0..10 → p10 = 1.0, p90 = 9.0 (linear interpolation)
    val df = (0 to 10).map(v => ("g", v.toLong, v.toDouble)).toDF("grp", "id", "v")
    val out = Binning.winsorize(df, Seq("grp"), "v", 0.1, 0.9)
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._2 -> (r._4, r._5, r._6)).toMap
    assert(out(0L) == ((1.0, 9.0, 1.0)))  // below lo → clipped up
    assert(out(5L) == ((1.0, 9.0, 5.0)))  // inside → untouched
    assert(out(10L) == ((1.0, 9.0, 9.0))) // above hi → clipped down
  }

  test("winsorize interpolates between order statistics like quantile_cont") {
    // 4 values → p25 of [10, 20, 30, 40] = 10 + 0.75*(20-10) = 17.5
    val df = Seq(10.0, 20.0, 30.0, 40.0).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("grp", "id", "v")
    val lo = Binning.winsorize(df, Seq("grp"), "v", 0.25, 0.75)
      .select("p_lo").distinct().as[Double].collect()
    assert(lo.toSeq == Seq(17.5))
  }

  test("equiDepth assigns ANSI ntile buckets (first buckets larger)") {
    // 5 rows, 2 bins → sizes 3 and 2
    val df = (1 to 5).map(v => ("g", v.toLong, v)).toDF("grp", "id", "v")
    val out = Binning.equiDepth(df, Seq("grp"), "v", "id", 2)
      .as[(String, Long, Int, Int)].collect().map(r => r._2 -> r._4).toMap
    assert(out == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2))
  }

  test("histogram counts per bin and clamps out-of-range into edge bins") {
    val df = Seq(-5.0, 0.0, 4.9, 5.0, 9.9, 10.0, 25.0)
      .zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("grp", "id", "v")
    val out = Binning.histogram(df, Seq("grp"), "v", lo = 0.0, hi = 10.0, bins = 2)
      .as[(String, Int, Long, Double, Double)]
      .collect().map(r => r._2 -> (r._3, r._4, r._5)).toMap
    // bin 0 = [0,5): -5 (clamped), 0, 4.9 → 3; bin 1 = [5,10]: 5, 9.9,
    // 10 (boundary clamps into the last bin), 25 (clamped) → 4
    assert(out == Map(0 -> ((3L, 0.0, 5.0)), 1 -> ((4L, 5.0, 10.0))))
  }
}
