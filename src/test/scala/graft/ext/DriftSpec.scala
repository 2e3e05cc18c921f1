package graft.ext

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical corpora drift to zero everywhere") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val out = Drift.vocabKl(docs, docs, "doc_id", "text")
      .as[(String, Long, Long, Double)].collect()
    assert(out.length == 3) // alpha, beta, gamma
    assert(out.forall(r => r._2 == r._3 && r._4 == 0.0))
  }

  test("a word missing from B gets a positive contribution; totals match " +
      "a hand-rolled smoothed KL") {
    val a = Seq((1L, "x x y")).toDF("doc_id", "text") // c: x=2, y=1, tA=3
    val b = Seq((1L, "x x x")).toDF("doc_id", "text") // c: x=3, y=0, tB=3
    val out = Drift.vocabKl(a, b, "doc_id", "text")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    val v = 2L // union vocab {x, y}
    def contrib(ca: Long, cb: Long): Double = {
      val pa = (ca + 1).toDouble / (3 + v).toDouble
      val pb = (cb + 1).toDouble / (3 + v).toDouble
      BigDecimal(pa * math.log(pa / pb) * 1.0e6)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out("y") == contrib(1, 0) && out("y") > 0) // y shrank in B
    assert(out("x") == contrib(2, 3) && out("x") < 0) // x grew in B
  }
}
