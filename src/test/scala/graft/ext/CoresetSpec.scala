package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def df(vecs: Seq[(Long, Seq[Double])]) = vecs.toDF("id", "vec")

  test("hand-checked selection order and radii on a line") {
    // seed = lowest id (1, at 0.0); farthest is 3 (at 1.0, d = 1e12);
    // then 2 (at 0.1, dmin = min(0.1², 0.9²) on the grid)
    val vecs = Seq(1L -> Seq(0.0), 2L -> Seq(0.1), 3L -> Seq(1.0))
    val out = Coreset.kCenter(df(vecs), "id", "vec", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._2)
    assert(out.toSeq === Seq(
      (1L, 0, 0L),
      (3L, 1, 1000000L * 1000000L),
      (2L, 2, 100000L * 100000L)))
  }

  test("radii never increase, and the farthest-tie breaks to the " +
      "lowest id") {
    val vecs = Seq(
      1L -> Seq(0.0, 0.0), 2L -> Seq(1.0, 0.0), 3L -> Seq(0.0, 1.0),
      4L -> Seq(1.0, 1.0), 5L -> Seq(0.5, 0.5))
    val out = Coreset.kCenter(df(vecs), "id", "vec", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._2)
    val radii = out.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"radii increased: ${out.toSeq}")
    // pick 1 is the corner (1,1); then 2 and 3 tie at 1e12 from both
    // chosen centers — the lower id must win
    assert(out(1)._1 === 4L && out(2)._1 === 2L)
  }

  test("coverage: every remaining point sits within the last radius " +
      "of some exemplar") {
    val rnd = new scala.util.Random(101)
    val vecs = (1L to 50L).map(i => i -> Seq.fill(3)(rnd.nextDouble()))
    val picks = Coreset.kCenter(df(vecs), "id", "vec", k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val lastRadius = picks.map(_._2).max // radii decrease; max = pick 1
    val chosen = picks.map(_._1).toSet
    def quant(x: Double) = math.round(x * 1000000L)
    val byId = vecs.toMap
    val worst = vecs.filterNot(v => chosen(v._1)).map { case (_, v) =>
      chosen.map { c =>
        byId(c).zip(v).map { case (a, b) =>
          val d = quant(a) - quant(b); d * d
        }.sum
      }.min
    }.max
    // the NEXT pick would have had radius ≤ the smallest chosen radius,
    // and every remaining dmin is ≤ that next radius
    assert(worst <= picks.map(_._2).filter(_ > 0).min,
      s"worst remaining $worst vs radii ${picks.toSeq}")
    assert(lastRadius > 0)
  }

  test("guards: empty frame and absent exemplars raise loudly") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "vec")
    val ex1 = intercept[IllegalArgumentException] {
      Coreset.kCenter(empty, "id", "vec", k = 2)
    }
    assert(ex1.getMessage.contains("non-empty"))
    val vecs = df(Seq(1L -> Seq(0.1), 2L -> Seq(0.2)))
    val ex2 = intercept[IllegalArgumentException] {
      Coreset.assign(vecs, "id", "vec", Seq(99L))
    }
    assert(ex2.getMessage.contains("exemplar"))
  }

  test("partition layout never changes the selection") {
    val vecs = (1L to 40L).map(i =>
      i -> Seq(0.01 * (i % 7), 0.03 * (i % 5), 0.02 * (i % 3)))
    def fit(parts: Int) = Coreset.kCenter(df(vecs).repartition(parts),
      "id", "vec", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._2).toSeq
    assert(fit(1) === fit(13))
  }
}
