package graft.ext

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", 1L, 10), ("a", 2L, 20), ("a", 3L, 30),
    ("b", 4L, 5), ("b", 5L, 5), // constant group
    ("c", 6L, 7) // singleton group
  ).toDF("grp", "id", "v")

  test("z and mm match hand-computed values per group") {
    val out = Normalize.grouped(rows, Seq("grp"), "v")
      .as[(String, Long, Int, Option[Double], Option[Double])]
      .collect().map(r => r._2 -> (r._4, r._5)).toMap
    // group a: mean 20, sd 10 → z = -1, 0, 1; mm = 0, 0.5, 1
    assert(out(1L) == ((Some(-1.0), Some(0.0))))
    assert(out(2L) == ((Some(0.0), Some(0.5))))
    assert(out(3L) == ((Some(1.0), Some(1.0))))
    // constant group: zero variance and max = min → both NULL
    assert(out(4L) == ((None, None)) && out(5L) == ((None, None)))
    // singleton: n < 2 → both NULL
    assert(out(6L) == ((None, None)))
  }

  test("null values neither skew the group stats nor score themselves") {
    val df = Seq(("a", 1L, Some(10)), ("a", 2L, Some(20)),
      ("a", 3L, Some(30)), ("a", 4L, None))
      .toDF("grp", "id", "v")
    val out = Normalize.grouped(df, Seq("grp"), "v")
      .as[(String, Long, Option[Int], Option[Double], Option[Double])]
      .collect().map(r => r._2 -> (r._4, r._5)).toMap
    // stats over the 3 non-null rows only: mean 20, sd 10
    assert(out(1L) == ((Some(-1.0), Some(0.0))))
    assert(out(3L) == ((Some(1.0), Some(1.0))))
    assert(out(4L) == ((None, None))) // the null row scores null
  }

  test("rankNormalize: percent_rank under the total order, 0.0 singleton") {
    val df = Seq(("a", 1L, 30), ("a", 2L, 10), ("a", 3L, 20), ("b", 4L, 7))
      .toDF("grp", "id", "v")
    val out = Normalize.rankNormalize(df, Seq("grp"), "v", "id")
      .as[(String, Long, Int, Double)].collect().map(r => r._2 -> r._4).toMap
    assert(out(2L) == 0.0 && out(3L) == 0.5 && out(1L) == 1.0)
    assert(out(4L) == 0.0)
  }

  test("mm lands exactly on the half-up grid for power-of-two ranges") {
    // range 32: v=1 gives 1/32 = 0.03125 — an exact .xxxx5 where
    // round(double) is engine-dependent; half-up must give 0.0313
    val df = (0 to 32).map(v => ("g", v.toLong, v)).toDF("grp", "id", "v")
    val out = Normalize.grouped(df, Seq("grp"), "v")
      .as[(String, Long, Int, Option[Double], Option[Double])]
      .collect().map(r => r._2 -> r._5).toMap
    assert(out(1L) == Some(0.0313))
    assert(out(16L) == Some(0.5))
  }
}
