package graft.ext

import graft.SparkSpec

class BasketSpec extends SparkSpec {
  import spark.implicits._

  // 4 baskets: {a,b} {a,b} {a,c} {c}
  private val rows = Seq(
    (1L, "a"), (1L, "b"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "c"),
    (4L, "c")
  ).toDF("basket", "item")

  test("lift = n_ab * N / (n_a * n_b), exact half-up 4 dp") {
    val out = Basket.pairLift(rows, "basket", "item")
      .as[(String, String, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> (r._3, r._6)).toMap
    // (a,b): n_ab=2, n_a=3, n_b=2, N=4 → lift = 8/6 = 1.3333
    assert(out(("a", "b")) == ((2L, 1.3333)))
    // (a,c): n_ab=1, n_a=3, n_c=2, N=4 → 4/6 = 0.6667
    assert(out(("a", "c")) == ((1L, 0.6667)))
    // no (b,c) pair (never co-occur)
    assert(!out.contains(("b", "c")))
  }

  test("duplicate items in one basket count once; minSupport filters") {
    val dup = rows.union(Seq((1L, "a")).toDF("basket", "item"))
    val out = Basket.pairLift(dup, "basket", "item", minSupport = 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set(("a", "b")))
    assert(out.head._3 == 2L) // dup did not inflate n_ab
  }

  test("coPairs matches the inline posting-list expansion, u < v") {
    val out = Basket.coPairs(rows, "basket", "item")
      .as[(String, String)].collect().toSeq.sorted
    assert(out == Seq(("a", "b"), ("a", "b"), ("a", "c")))
  }

  test("maxBasket drops a hot basket's pairs entirely, keeps the rest") {
    // basket 9 is the hot one: 5 distinct items → C(5,2)=10 pairs if
    // unguarded; the cap removes all of them, none survive partially
    val hot = rows.union(
      (1 to 5).map(i => (9L, s"h$i")).toDF("basket", "item"))
    val guarded = Basket.coPairs(hot, "basket", "item", maxBasket = Some(4))
      .as[(String, String)].collect().toSeq.sorted
    assert(guarded == Seq(("a", "b"), ("a", "b"), ("a", "c")))
    val unguarded = Basket.coPairs(hot, "basket", "item")
    assert(unguarded.count() == 13) // 3 + C(5,2)
  }

  test("pairLift maxBasket removes the hot basket from N and supports") {
    // hot basket {a, h1..h4}: capped out, so it must not count toward
    // n_a or N — lift values must equal the 4-basket fixture exactly
    val hot = rows.union(
      (Seq((9L, "a")) ++ (1 to 4).map(i => (9L, s"h$i")))
        .toDF("basket", "item"))
    val out = Basket.pairLift(hot, "basket", "item", maxBasket = Some(4))
      .as[(String, String, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4, r._6)).toMap
    assert(out(("a", "b")) == ((2L, 3L, 1.3333))) // n_a=3 not 4, N=4 not 5
    assert(!out.keys.exists { case (x, y) => x.startsWith("h") || y.startsWith("h") })
  }
}
