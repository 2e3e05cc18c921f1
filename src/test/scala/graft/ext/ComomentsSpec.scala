package graft.ext

import graft.SparkSpec

class ComomentsSpec extends SparkSpec {
  import spark.implicits._

  test("sums match the hand computation, diagonal carries variance") {
    val df = Seq(("g", 1.0, 10.0), ("g", 2.0, 20.0), ("g", 3.0, 30.0))
      .toDF("k", "x", "y")
    val out = Comoments.comoments(df, Seq("k"),
        Seq("x" -> 1L, "y" -> 1L))
      .collect().map(r => ((r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out(("x", "x")) === ((3L, 6L, 6L, 14L)))
    assert(out(("x", "y")) === ((3L, 6L, 60L, 140L)))
    assert(out(("y", "y")) === ((3L, 60L, 60L, 1400L)))
  }

  test("quantization is half-up on the per-feature grid") {
    val df = Seq(("g", 0.005, 0.015)).toDF("k", "a", "b")
    val out = Comoments.comoments(df, Seq("k"),
        Seq("a" -> 100L, "b" -> 100L))
      .collect().map(r => ((r.getString(1), r.getString(2)),
        (r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // 0.005*100+0.5 = 1.0 -> 1 (ties up); 0.015*100 = 1.5000000000000002
    assert(out(("a", "b")) === ((1L, 2L, 2L)))
  }

  test("pairwise deletion: a null drops only that feature's pairs") {
    val df = Seq(("g", Some(1.0), Some(5.0)), ("g", None, Some(7.0)),
      ("g", Some(3.0), None)).toDF("k", "x", "y")
    val out = Comoments.comoments(df, Seq("k"),
        Seq("x" -> 1L, "y" -> 1L))
      .collect().map(r => ((r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out(("x", "x")) === ((2L, 4L, 4L, 10L)))  // rows 1,3
    assert(out(("y", "y")) === ((2L, 12L, 12L, 74L))) // rows 1,2
    assert(out(("x", "y")) === ((1L, 1L, 5L, 5L)))    // row 1 only
  }

  test("groups aggregate independently") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)).toDF("k", "x")
    val out = Comoments.comoments(df, Seq("k"), Seq("x" -> 1L))
      .collect().map(r => (r.getString(0),
        (r.getLong(3), r.getLong(4), r.getLong(6)))).toMap
    assert(out("a") === ((2L, 3L, 5L)))
    assert(out("b") === ((1L, 10L, 100L)))
  }

  test("correlation derived from the sums is exact where expected") {
    // y = 2x exactly -> Pearson r must be exactly 1.0 from the sums
    val df = (1 to 50).map(i => ("g", i.toDouble, 2.0 * i))
      .toDF("k", "x", "y")
    val m = Comoments.comoments(df, Seq("k"), Seq("x" -> 1L, "y" -> 1L))
      .collect().map(r => ((r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val (n, sx, _, sxy) = m(("x", "y"))
    val (_, _, _, sxx) = m(("x", "x"))
    val (_, sy, _, syy) = m(("y", "y"))
    // r = 1 ⟺ num² = varx·vary — checked in exact integer arithmetic
    // (a float sqrt would round the product to 0.99999…)
    val num = BigInt(n * sxy - sx * sy)
    val varx = BigInt(n * sxx - sx * sx)
    val vary = BigInt(n * syy - sy * sy)
    assert(num > 0 && num * num === varx * vary)
  }
}
