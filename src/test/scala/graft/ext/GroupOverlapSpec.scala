package graft.ext

import graft.SparkSpec

class GroupOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (String, String)*) =
    GroupOverlap.pairwise(rows.toSeq.toDF("g", "e"), "g", "e")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("sizes, intersections, and exact micro-Jaccard") {
    val m = run(("a", "x"), ("a", "y"), ("a", "z"),
      ("b", "y"), ("b", "z"), ("b", "w"), ("c", "q"))
    // a={x,y,z}, b={y,z,w}: common 2, union 4 -> 0.5
    assert(m(("a", "b")) === ((3L, 3L, 2L, 500000L)))
    assert(!m.contains(("a", "c")) && !m.contains(("b", "c"))) // disjoint
  }

  test("membership is set-semantics: duplicates don't inflate") {
    val m = run(("a", "x"), ("a", "x"), ("a", "x"), ("b", "x"), ("b", "x"))
    assert(m(("a", "b")) === ((1L, 1L, 1L, 1000000L)))
  }

  test("pairs are named under ascending group order") {
    val m = run(("zz", "e"), ("aa", "e"))
    assert(m.keySet === Set(("aa", "zz")))
  }

  test("three-way overlap produces all three pairs from one element") {
    val m = run(("a", "s"), ("b", "s"), ("c", "s"), ("a", "t"), ("b", "t"))
    assert(m.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(m(("a", "b")) === ((2L, 2L, 2L, 1000000L)))
    assert(m(("a", "c")) === ((2L, 1L, 1L, 500000L)))
  }

  test("half-up rounding of the micro-Jaccard boundary") {
    // common 1, union 3 -> 333333.33 -> rounds to 333333
    val m = run(("a", "x"), ("a", "y"), ("b", "x"), ("b", "z"))
    assert(m(("a", "b"))._4 === 333333L)
  }
}
