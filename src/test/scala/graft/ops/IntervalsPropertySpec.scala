package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property gate: `Intervals.gaps` is the EXACT complement of
  * `Intervals.mergeOverlapping` for arbitrary interval sets — every gap
  * lies strictly between two consecutive merged islands, and together
  * islands + gaps tile each key's covered span with no overlap and no
  * slack. Random intervals (fixed seed, manual sampling — no
  * scalatest-plus bridge in the build). */
class IntervalsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val ivGen = for {
    key <- Gen.oneOf("k1", "k2")
    s   <- Gen.choose(0L, 200L)
    len <- Gen.choose(0L, 40L)
  } yield (key, s, s + len)

  private def sample(i: Int): List[(String, Long, Long)] =
    Gen.listOfN(25, ivGen)(Gen.Parameters.default, Seed(7L + i))
      .getOrElse(Nil)

  test("gaps complement islands exactly, for arbitrary interval sets") {
    (0 until 8).foreach { i =>
      val df = sample(i).toDF("k", "s", "e")
      val islands = Intervals.mergeOverlapping(df, Seq("k"), "s", "e")
        .as[(String, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).sorted.toSeq)
      val gaps = Intervals.gaps(df, Seq("k"), "s", "e")
        .as[(String, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).sorted.toSeq)
        .toMap
      islands.foreach { case (k, isl) =>
        val expected = isl.sliding(2).collect {
          case Seq((_, e1), (s2, _)) if s2 > e1 => (e1, s2)
        }.toSeq
        assert(gaps.getOrElse(k, Seq.empty) == expected, s"seed $i key $k")
        // islands never overlap or touch (they would have merged)
        isl.sliding(2).foreach {
          case Seq((_, e1), (s2, _)) => assert(s2 > e1, s"seed $i key $k")
          case _ =>
        }
      }
    }
  }
}
