package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f)),
    (2L, Array(0f, 1f, 0f)),
    (3L, Array(-1f, 0f, 0f)),
    (4L, Array(0.8f, 0.2f, 0f))
  ).toDF("vec_id", "embedding")

  test("cosine: parallel ≈ 1, orthogonal = 0, anti-parallel = -1") {
    val df = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("i"), $"b.vec_id".as("j"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    assert(math.abs(df((0L, 0L)) - 1.0) < 1e-12)
    assert(math.abs(df((0L, 2L))) < 1e-12)
    assert(math.abs(df((0L, 3L)) + 1.0) < 1e-12)
  }

  test("native DecimalDot matches the oracle semantics bit-for-bit " +
    "(exact decimal sum) and the legacy HOF fold at observable precision") {
    // deterministic pseudo-random floats spanning signs and magnitudes
    val rnd = new scala.util.Random(42)
    val pairs = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(64)
      def v() = Array.fill(n)((rnd.nextGaussian() *
        math.pow(10, rnd.nextInt(7) - 3)).toFloat)
      (i.toLong, v(), v())
    }
    // reference = the DuckDB oracle's formulation: exact sum of per-element
    // products each rounded to DECIMAL scale 15 (DuckDB sums decimals
    // exactly; the legacy HOF fold instead rounded its accumulator to
    // scale 14 per step — a 1e-14 drift the 4-dp result rounding absorbed)
    def oracleDot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        java.math.BigDecimal.valueOf(x.toDouble * y.toDouble)
          .setScale(15, java.math.RoundingMode.HALF_UP)
      }.foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue()
    val out = pairs.toDF("id", "a", "b")
      .select(col("id"),
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .as[(Long, Double, Double)].collect()
    out.foreach { case (id, nat, hof) =>
      val ref = oracleDot(pairs(id.toInt)._2, pairs(id.toInt)._3)
      assert(java.lang.Double.doubleToRawLongBits(nat) ==
        java.lang.Double.doubleToRawLongBits(ref), s"pair $id: $nat != $ref")
      assert(math.abs(nat - hof) <= 5e-13 * math.max(1.0, math.abs(nat)),
        s"pair $id: native $nat vs hof $hof")
    }
  }

  test("DecimalDot null semantics mirror zip_with/aggregate") {
    val df = Seq(
      (1L, Array(1f, 2f), Array(3f, 4f)),          // plain
      (2L, Array[Float](), Array[Float]()),        // empty → 0.0
      (3L, Array(1f, 2f), Array(3f))               // length mismatch → null
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L) == (Some(11.0), Some(11.0)))
    assert(out(2L) == (Some(0.0), Some(0.0)))
    assert(out(3L) == (None, None))
    // double-element arrays work too (IvfIndex round-trips)
    val d = Seq((1L, Array(1.5, 2.0), Array(2.0, 3.0))).toDF("id", "a", "b")
      .select(Similarity.dot(col("a"), col("b"))).as[Double].collect()
    assert(d.head == 9.0)
  }

  test("bruteForceTopK ranks by cosine desc, excludes self") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 3)
      .select("neighbor_id", "rk").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq(1L, 4L, 2L)) // by similarity to e_x
    assert(!out.map(_._1).contains(0L))
  }

  test("lshTopK returns a subset of brute-force candidates (same bucket)") {
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" < 2),
      "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(vecs, vecs.filter($"vec_id" < 2),
      "vec_id", "embedding", k = 5, bucketBits = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
    assert(lsh.nonEmpty) // 0 and 1 share the (+,·,·) bucket
  }

  test("int8 quantization: endpoints hit ±127, zero stays zero") {
    val df = Seq((1L, Seq(2.0f, -2.0f, 0.0f, 1.0f))).toDF("id", "v")
      .withColumn("am", Similarity.absMax($"v"))
      .withColumn("q", Similarity.int8Quantize($"v", $"am"))
    val (am, q) = df.select("am", "q").as[(Double, Seq[Int])].collect().head
    assert(am == 2.0)
    assert(q == Seq(127, -127, 0, 64)) // 1.0/2*127 + 0.5 = 64.0 → 64
    val n = df.select(Similarity.l2Norm($"v")).as[Double].collect().head
    assert(n == 3.0) // sqrt(4 + 4 + 0 + 1)
  }
}
