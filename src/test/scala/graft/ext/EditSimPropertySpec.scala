package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property gate for the FastSS completeness theorem: on RANDOM string
  * tables over a small alphabet (where distance-1 pairs are dense and
  * adversarial — repeats, empty-adjacent variants, shared deletion
  * neighborhoods at distance 2), the blocked join must equal the
  * brute-force quadratic join EXACTLY. Fixed seeds, deterministic. */
class EditSimPropertySpec extends SparkSpec {
  import spark.implicits._

  private def strings(i: Int): List[String] = {
    val g = for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    Gen.listOfN(40, g)(Gen.Parameters.default, Seed(97L + i)).getOrElse(Nil)
  }

  test("blocked dist-1 join == brute force on random small-alphabet tables") {
    (0 until 6).foreach { i =>
      val rows = strings(i).zipWithIndex.map { case (s, id) => (id.toLong, s) }
      val df = rows.toDF("id", "s")
      val blocked = EditSim.dist1Pairs(df, "id", "s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = (for {
        (a, ia) <- rows; (b, ib) <- rows if a < b
        d = levenshteinRef(ia, ib) if d <= 1
      } yield (a, b, d)).toSet
      assert(blocked === brute,
        s"seed $i: missing=${brute -- blocked} extra=${blocked -- brute}")
    }
  }

  /** Reference Wagner–Fischer, independent of Spark's levenshtein. */
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
