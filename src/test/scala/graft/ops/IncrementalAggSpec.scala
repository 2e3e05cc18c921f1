package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    k <- Gen.oneOf("a", "b", "c")
    v <- Gen.choose(-100.0, 100.0).map(x => math.rint(x * 100) / 100)
  } yield (k, v)

  private def sample(i: Int): List[(String, Double)] =
    Gen.listOfN(40, rowGen)(Gen.Parameters.default, Seed(3L + i))
      .getOrElse(Nil)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("merge(state(A), B) == state(A ∪ B) for arbitrary splits") {
    (0 until 6).foreach { i =>
      val all = sample(i)
      val (a, b) = all.splitAt(all.size * (i % 4) / 4) // incl. empty sides
      val aDf = a.toDF("k", "v"); val bDf = b.toDF("k", "v")
      val incremental = IncrementalAgg.merge(
        IncrementalAgg.aggregate(aDf, Seq("k"), "v"), bDf, Seq("k"), "v")
      val recomputed = IncrementalAgg.aggregate(
        aDf.union(bDf), Seq("k"), "v")
      assert(canon(incremental) == canon(recomputed), s"seed $i")
    }
  }

  test("keys only in the batch or only in state survive with exact partials") {
    val state = IncrementalAgg.aggregate(
      Seq(("old", 1.0), ("both", 2.0)).toDF("k", "v"), Seq("k"), "v")
    val merged = IncrementalAgg.merge(state,
      Seq(("new", 5.0), ("both", 4.0)).toDF("k", "v"), Seq("k"), "v")
    val m = IncrementalAgg.withDerived(merged)
      .as[(String, Long, BigDecimal, Double, Double, Double)]
      .collect().map(r => r._1 -> (r._2, r._4, r._5, r._6)).toMap
    assert(m("old") == ((1L, 1.0, 1.0, 1.0)))
    assert(m("new") == ((1L, 5.0, 5.0, 5.0)))
    assert(m("both") == ((2L, 2.0, 4.0, 3.0))) // min 2, max 4, avg 3
  }
}
