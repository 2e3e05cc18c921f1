package graft.ext

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property gate: the distributed k-means equals an independent
  * driver-side reference Lloyd's on the same quantized-integer
  * semantics (grid, tie rule, half-up mean, vanishing clusters) for
  * random vector tables — the operator's whole contract, replayed in
  * plain Scala instead of SQL. Fixed seeds, deterministic. */
class KMeansPropertySpec extends SparkSpec {
  import spark.implicits._

  private val GRID = 1000000L

  private def vecs(i: Int): List[(Long, Seq[Double])] = {
    val g = for {
      v <- Gen.listOfN(3, Gen.choose(-1000000, 1000000).map(_ / 1000000.0))
    } yield v: Seq[Double]
    Gen.listOfN(25, g)(Gen.Parameters.default, Seed(7L + i)).getOrElse(Nil)
      .zipWithIndex.map { case (v, id) => (id.toLong, v) }
  }

  private def reference(rows: List[(Long, Seq[Double])], k: Int,
      rounds: Int): Map[Long, (Int, Long)] = {
    val q = rows.map { case (id, v) =>
      id -> v.map(x => math.round(x * GRID)).toVector }.toMap
    val ids = rows.map(_._1).sorted
    var cents: Map[Int, Vector[Long]] =
      ids.take(k).zipWithIndex.map { case (id, c) => c -> q(id) }.toMap
    var asg: Map[Long, (Int, Long)] = Map.empty
    (1 to rounds).foreach { r =>
      asg = q.map { case (id, v) =>
        val best = cents.toSeq.map { case (c, cv) =>
          val d = v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, c)
        }.min
        id -> (best._2, best._1)
      }
      if (r < rounds) {
        cents = asg.groupBy(_._2._1).map { case (c, members) =>
          val vs = members.keys.map(q).toVector
          val n = vs.size.toLong
          c -> (0 until vs.head.size).map { d =>
            val s = vs.map(_(d)).sum
            math.floor((2.0 * s + n) / (2.0 * n)).toLong
          }.toVector
        }
      }
    }
    asg
  }

  test("distributed assignments == reference Lloyd's on random tables") {
    (0 until 5).foreach { i =>
      val rows = vecs(i)
      val got = KMeans.assignments(rows.toDF("id", "vec"), "id", "vec",
          k = 3, rounds = 3)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
      assert(got === reference(rows, 3, 3), s"seed $i")
    }
  }
}
