package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalarQuantSpec extends SparkSpec {
  import spark.implicits._

  private def df(vecs: Seq[(Long, Seq[Double])]) = vecs.toDF("id", "vec")

  test("hand-checked ranges and codes") {
    // dim 0 spans [0, 0.51] (q: 0..510000), dim 1 constant 0.2
    val vecs = Seq(
      1L -> Seq(0.00, 0.2), 2L -> Seq(0.255, 0.2), 3L -> Seq(0.51, 0.2))
    val rng = ScalarQuant.ranges(df(vecs), "id", "vec")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rng(0) === (0L, 510000L) && rng(1) === (200000L, 200000L))
    val codes = ScalarQuant.encode(df(vecs), "id", "vec",
      ScalarQuant.ranges(df(vecs), "id", "vec"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    // dim 0: 255*q/510000 → 0, 127, 255; dim 1 (constant): code 0
    assert(codes((1L, 0)) === 0 && codes((2L, 0)) === 127 &&
      codes((3L, 0)) === 255)
    assert(Seq(1L, 2L, 3L).forall(i => codes((i, 1)) === 0))
  }

  test("constant dimensions reconstruct exactly, so ADC over them is " +
      "the exact distance") {
    // every dim constant per position across the corpus → Δ = 0 →
    // recon = qmin exactly → ADC(q, v) = exact quantized distance
    val corpus = Seq(
      1L -> Seq(0.1, 0.3), 2L -> Seq(0.1, 0.3), 3L -> Seq(0.1, 0.3))
    val rng = ScalarQuant.ranges(df(corpus), "id", "vec")
    val codes = ScalarQuant.encode(df(corpus), "id", "vec", rng)
    val out = ScalarQuant.adcTopK(codes, rng,
      df(Seq(9L -> Seq(0.2, 0.3))), "id", "vec", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    out.foreach { case (_, d) => assert(d === 100000L * 100000L) }
    assert(out.map(_._1).toSet === Set(1L, 2L, 3L))
  }

  test("out-of-range components of new vectors clamp to the range ends") {
    val corpus = Seq(1L -> Seq(0.1), 2L -> Seq(0.2))
    val rng = ScalarQuant.ranges(df(corpus), "id", "vec")
    val codes = ScalarQuant.encode(
      df(Seq(7L -> Seq(-5.0), 8L -> Seq(9.0))), "id", "vec", rng)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(codes(7L) === 0 && codes(8L) === 255)
  }

  test("reconstruction error is bounded by one quantization cell") {
    val rnd = new scala.util.Random(89)
    val vecs = (1L to 30L).map(i => i -> Seq.fill(4)(rnd.nextDouble() - 0.5))
    val rng = ScalarQuant.ranges(df(vecs), "id", "vec")
    val codes = ScalarQuant.encode(df(vecs), "id", "vec", rng)
    // |q - recon| ≤ Δ/510 + Δ/255 is loose; assert the tight practical
    // bound: err < Δ/255 + 1 (one cell width on the integer grid)
    val errs = codes.join(broadcast(rng), "pos")
      .join(PqIndex.comps(df(vecs), "id", "vec", 1), Seq("vid", "pos"))
      .select(col("qmax") - col("qmin"),
        abs(col("q") - (col("qmin") +
          expr("((2 * code + 1) * (qmax - qmin)) div 510"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    errs.foreach { case (delta, err) =>
      assert(err <= delta / 255L + 1L, s"err $err for range width $delta")
    }
  }

  test("partition layout never changes the result") {
    val vecs = (1L to 40L).map(i =>
      i -> Seq(0.01 * (i % 7), 0.03 * (i % 5), 0.02 * (i % 3)))
    def fit(parts: Int) = {
      val v = df(vecs).repartition(parts)
      val rng = ScalarQuant.ranges(v, "id", "vec")
      ScalarQuant.adcTopK(ScalarQuant.encode(v, "id", "vec", rng), rng,
        df(vecs.take(3)), "id", "vec", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).sortBy(x => (x._1, x._4)).toSeq
    }
    assert(fit(1) === fit(13))
  }
}
