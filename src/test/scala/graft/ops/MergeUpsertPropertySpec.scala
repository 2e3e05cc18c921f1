package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based gate for the reference's core invariant (SURVEY.md §7.3):
  * merge-upsert is idempotent and never loses existing values to absent
  * incoming properties, for ARBITRARY batches (scalacheck generators,
  * fixed seed for reproducibility; no scalatest-plus bridge in the build,
  * so sampling is driven manually). */
class MergeUpsertPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    key  <- Gen.choose(0, 5)
    prop <- Gen.option(Gen.alphaStr.map(_.take(4)))
    m    <- Gen.choose(0.0, 10.0)
  } yield (s"k$key", prop, m)

  private val batchGen =
    Gen.listOfN(6, rowGen).map(_.distinctBy(_._1)) // unique keys per batch

  private def samples(n: Int): Seq[List[(String, Option[String], Double)]] =
    (0 until n).map { i =>
      batchGen(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(List.empty)
    }

  test("merge(merge(e, b), b) == merge(e, b) — idempotence for any batch") {
    samples(10).grouped(2).foreach { case Seq(existing, batch) =>
      val e = existing.toDF("name", "prop", "metric")
      val b = batch.toDF("name", "prop", "metric")
      val once = MergeUpsert(e, b, Seq("name"), Seq("prop", "metric"))
      val twice = MergeUpsert(once, b, Seq("name"), Seq("prop", "metric"))
      assert(once.collect().map(_.toString).sorted.toSeq ==
        twice.collect().map(_.toString).sorted.toSeq)
    }
  }

  test("absent incoming props never erase stored values, for any batch") {
    samples(10).grouped(2).foreach { case Seq(existing, batch) =>
      val merged = MergeUpsert(
        existing.toDF("name", "prop", "metric"),
        batch.toDF("name", "prop", "metric"),
        Seq("name"), Seq("prop", "metric")).collect()
      val exMap = existing.map(r => r._1 -> r._2).toMap
      val inMap = batch.map(r => r._1 -> r._2).toMap
      merged.foreach { row =>
        val k = row.getString(0)
        val expected = inMap.getOrElse(k, None).orElse(exMap.getOrElse(k, None))
        assert(Option(row.getString(1)) == expected,
          s"key $k: stored prop lost or clobbered")
      }
    }
  }
}
