package graft.ext

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property gate: `Coverage.nucleus` keeps the MINIMAL covering prefix —
  * the kept set reaches p·total, dropping its last (lightest) member
  * falls below p, and membership is prefix-closed under the
  * (weight desc, item asc) order. Random weight tables, fixed seed. */
class CoveragePropertySpec extends SparkSpec {
  import spark.implicits._

  private val wGen = for {
    item <- Gen.choose(0, 19).map(i => f"i$i%02d")
    w    <- Gen.choose(1L, 50L)
  } yield (item, w)

  private def sample(i: Int): List[(String, Long)] =
    Gen.listOfN(15, wGen)(Gen.Parameters.default, Seed(11L + i))
      .getOrElse(Nil).distinctBy(_._1)

  test("nucleus keeps the minimal covering prefix for arbitrary weights") {
    (0 until 8).foreach { i =>
      val rows = sample(i)
      if (rows.nonEmpty) {
        val total = rows.map(_._2).sum
        val df = rows.map { case (it, w) => ("g", it, w) }
          .toDF("grp", "item", "w")
        val kept = Coverage.nucleus(df, Seq("grp"), "item", "w", 7, 10)
          .select("item").as[String].collect().toSet
        val order = rows.sortBy { case (it, w) => (-w, it) }
        val keptOrdered = order.filter(r => kept(r._1))
        // prefix-closed: kept items are exactly the first |kept| of the order
        assert(order.take(kept.size).map(_._1).toSet == kept, s"seed $i")
        // covering: 10·sum(kept) ≥ 7·total
        val sumKept = keptOrdered.map(_._2).sum
        assert(10 * sumKept >= 7 * total, s"seed $i")
        // minimal: dropping the last kept member falls below p
        assert(10 * (sumKept - keptOrdered.last._2) < 7 * total, s"seed $i")
      }
    }
  }
}
