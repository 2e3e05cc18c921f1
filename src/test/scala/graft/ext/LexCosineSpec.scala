package graft.ext

import graft.SparkSpec

class LexCosineSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], tauNum: Long, tauDen: Long,
      maxDF: Long = 1000L) =
    LexCosine.tfCosinePairs(docs.toDF("id", "text"), "id", "text",
        tauNum, tauDen, maxDF)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap

  test("hand-checked cosine on tiny vectors") {
    // d1 = {a:2, b:1}, d2 = {a:1, b:1}: num=3, na=5, nb=2,
    // cos = 3/sqrt(10) ≈ 0.9487
    val p = pairs(Seq(1L -> "a a b", 2L -> "a b"), 1, 2)
    val (num, na, nb, cos4) = p((1L, 2L))
    assert((num, na, nb) === (3L, 5L, 2L))
    assert(cos4 === math.rint(3.0 / math.sqrt(10.0) * 10000) / 10000)
  }

  test("the threshold is exact at the boundary (integer cross-multiply)") {
    // identical docs: cos = 1 — kept at tau = 1/1
    assert(pairs(Seq(1L -> "x y", 2L -> "x y"), 1, 1).contains((1L, 2L)))
    // orthogonal docs share no term: no pair row at all
    assert(pairs(Seq(1L -> "x", 2L -> "y"), 0, 1).isEmpty)
    // cos = 1/2 exactly: d1={a:1,b:1,c:1,d:1}, d2={a:1,e:1,f:1,g:1}
    // num=1, na=nb=4 -> cos=1/4... use d1={a,b}, d2={a,c}: num=1,
    // na=nb=2, cos=1/2 — kept at tau=1/2, dropped at tau 51/100
    val atHalf = pairs(Seq(1L -> "a b", 2L -> "a c"), 1, 2)
    assert(atHalf.contains((1L, 2L)))
    val above = pairs(Seq(1L -> "a b", 2L -> "a c"), 51, 100)
    assert(!above.contains((1L, 2L)))
  }

  test("stop-term projection removes the term from the vector space") {
    // "the" hits every doc; with maxDF=2 it is projected OUT, so the
    // two docs sharing only "the" have no pair and norms shrink
    val docs = Seq(1L -> "the cat", 2L -> "the dog", 3L -> "the cat")
    val p = pairs(docs, 1, 2, maxDF = 2)
    assert(p.keySet === Set((1L, 3L))) // only the "cat" pair survives
    val (num, na, nb, _) = p((1L, 3L))
    assert((num, na, nb) === (1L, 1L, 1L)) // "the" absent from norms
  }

  test("matches a driver-side brute force over the kept vocabulary") {
    val docs = (1L to 12L).map(i =>
      i -> (1 to 8).map(j => s"w${(i * j * 7) % 13}").mkString(" "))
    val maxDF = 6L
    val vecs = {
      val tf = docs.map { case (id, t) =>
        id -> t.split(" ").groupBy(identity).view.mapValues(_.length.toLong).toMap }
      val dfc = tf.flatMap(_._2.keys).groupBy(identity).view.mapValues(_.size)
      tf.map { case (id, m) =>
        id -> m.filter { case (w, _) => dfc(w) <= maxDF } }.toMap
    }
    val brute = (for {
      a <- vecs.keys; b <- vecs.keys if a < b
      num = vecs(a).keySet.intersect(vecs(b).keySet).toSeq
        .map(w => vecs(a)(w) * vecs(b)(w)).sum
      if num > 0
      na = vecs(a).values.map(x => x * x).sum
      nb = vecs(b).values.map(x => x * x).sum
      if num * num * 4 >= na * nb // tau = 1/2
    } yield (a, b)).toSet
    assert(pairs(docs, 1, 2, maxDF).keySet === brute)
  }
}
