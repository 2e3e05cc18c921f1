package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  test("one round from zero weights is the hand-computed batch update") {
    // w=0: every margin is 0, y*0 <= 0 everywhere, so EVERY row is
    // misclassified and dw = sum of y*(1, x).
    val f = Seq((1L, 1L, 3L), (2L, 1L, 5L), (3L, -1L, 2L), (4L, -1L, 1L))
      .toDF("id", "y", "x")
    val m = Perceptron.train(f, "y", Seq("x"), rounds = 1)
    // bias: 1+1-1-1 = 0; x: 3+5-2-1 = 5
    assert(m.w.toSeq === Seq(0L, 5L))
  }

  test("separable data trains to zero error and predict agrees") {
    // y = sign(x): round 1 from zero weights updates on every row
    // (dw_x = 30, db = 0), which already separates — later rounds see
    // an empty misclassified set and must be a FIXED POINT
    val f = ((-5L to -1L).map(i => (i, -1L, i)) ++
      (1L to 5L).map(i => (i, 1L, i))).toDF("id", "y", "x")
    val m = Perceptron.train(f, "y", Seq("x"), rounds = 4)
    assert(m.w.toSeq === Seq(0L, 30L),
      s"converged weights drifted: ${m.w.toSeq}")
    val preds = m.predict(f, "id").join(f, "id")
      .select(col("y"), col("pred")).as[(Long, Int)].collect()
    assert(preds.forall { case (y, p) => y == p.toLong },
      s"training error nonzero: weights ${m.w.toSeq}")
  }

  test("multi-feature margins are the exact integer dot product") {
    val f = Seq((1L, 1L, 2L, 7L), (2L, -1L, 4L, 1L)).toDF("id", "y", "a", "b")
    val m = Perceptron.train(f, "y", Seq("a", "b"), rounds = 2)
    val out = m.predict(f, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(1L) === m.w(0) + m.w(1) * 2L + m.w(2) * 7L)
    assert(out(2L) === m.w(0) + m.w(1) * 4L + m.w(2) * 1L)
  }

  test("partition layout never changes the trained weights") {
    val f = (1L to 60L).map(i =>
      (i, if (i % 3 == 0) 1L else -1L, i % 7, i % 5)).toDF("id", "y", "a", "b")
    def fit(parts: Int) = Perceptron.train(f.repartition(parts),
      "y", Seq("a", "b"), rounds = 4).w.toSeq
    assert(fit(1) === fit(13))
  }

  test("averaged weights are the exact running sum of per-round " +
      "weights") {
    val f = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) 1L else -1L, i % 7, i % 5)).toDF("id", "y", "a", "b")
    val rounds = 5
    // replay: fold round() by hand, accumulating after each round
    var w = Array.fill(3)(0L)
    val want = Array.fill(3)(0L)
    (1 to rounds).foreach { _ =>
      w = Perceptron.round(f, "y", Seq("a", "b"), w, allowEmpty = false)
      (0 until 3).foreach(j => want(j) += w(j))
    }
    val m = Perceptron.trainAveraged(f, "y", Seq("a", "b"), rounds)
    assert(m.w.toSeq === want.toSeq)
  }

  test("averaged model on separable data: fixed point makes the sum " +
      "rounds x the converged weights, and predictions agree with " +
      "train's") {
    val f = ((-5L to -1L).map(i => (i, -1L, i)) ++
      (1L to 5L).map(i => (i, 1L, i))).toDF("id", "y", "x")
    val avg = Perceptron.trainAveraged(f, "y", Seq("x"), rounds = 4)
    // round 1 reaches (0, 30) and rounds 2..4 are fixed points, so the
    // accumulated sum is 4 x (0, 30) — positive scaling, same classifier
    assert(avg.w.toSeq === Seq(0L, 120L))
    val fin = Perceptron.train(f, "y", Seq("x"), rounds = 4)
    val a = avg.predict(f, "id").select(col("id"), col("pred"))
      .as[(Long, Int)].collect().toMap
    val b = fin.predict(f, "id").select(col("id"), col("pred"))
      .as[(Long, Int)].collect().toMap
    assert(a === b)
  }

  test("averaged accumulator overflow raises loudly, not wraps") {
    // weights after round 1 are huge (bounds pass admits them), so the
    // repeated accumulation must trip addExact's loud guard — or the
    // per-round bounds guard, either way an exception not a wrap
    val big = Long.MaxValue / 8
    val f = Seq((1L, 1L, big), (2L, 1L, big)).toDF("id", "y", "x")
    intercept[Exception] {
      Perceptron.trainAveraged(f, "y", Seq("x"), rounds = 6)
    }
  }

  test("guards: bad labels, empty frame, and overflow raise loudly") {
    val bad = Seq((1L, 2L, 3L)).toDF("id", "y", "x")
    val ex1 = intercept[IllegalArgumentException] {
      Perceptron.train(bad, "y", Seq("x"), rounds = 1)
    }
    assert(ex1.getMessage.contains("label"))
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "y", "x")
    val ex2 = intercept[IllegalArgumentException] {
      Perceptron.train(empty, "y", Seq("x"), rounds = 1)
    }
    assert(ex2.getMessage.contains("non-empty"))
    // a feature at the BIGINT edge: the bounds check trips before any
    // aggregate could wrap
    val huge = Seq((1L, 1L, Long.MaxValue / 2), (2L, -1L, Long.MaxValue / 2))
      .toDF("id", "y", "x")
    intercept[Exception] {
      Perceptron.train(huge, "y", Seq("x"), rounds = 3)
    }
  }
}
