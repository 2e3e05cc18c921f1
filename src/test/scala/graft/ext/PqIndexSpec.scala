package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def df(vecs: Seq[(Long, Seq[Double])]) = vecs.toDF("id", "vec")

  test("m=1 reduces to KMeans.assignments bit-for-bit") {
    // PQ with one subspace IS Lloyd's over the full vector — same
    // grid, same init rule, same tie-break. Codes must equal cluster
    // ids and residuals must equal sqdists exactly.
    val vecs = Seq(
      1L -> Seq(0.00, 0.5), 2L -> Seq(0.01, 0.5), 3L -> Seq(0.02, 0.5),
      4L -> Seq(0.40, 0.1), 5L -> Seq(0.41, 0.1), 6L -> Seq(0.42, 0.1))
    val km = KMeans.assignments(df(vecs), "id", "vec", k = 2, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    val cb = PqIndex.codebooks(df(vecs), "id", "vec", m = 1, k = 2, rounds = 2)
    val pq = PqIndex.encode(df(vecs), "id", "vec", cb)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).sortBy(_._1)
    assert(pq === km)
  }

  test("subspaces train independently: hand-checked 2x2 codebook") {
    // dim 4, m=2 (subDim 2), k=2, rounds=2. Subspace 0 separates ids
    // {1,2} from {3,4}; subspace 1 separates {1,3} from {2,4} — the
    // code GRID is the product, which one joint k=2 clustering could
    // never express (that's the point of PQ).
    val vecs = Seq(
      1L -> Seq(0.0, 0.0, 0.0, 0.0),
      2L -> Seq(0.0, 0.0, 0.4, 0.4),
      3L -> Seq(0.4, 0.4, 0.0, 0.0),
      4L -> Seq(0.4, 0.4, 0.4, 0.4))
    val cb = PqIndex.codebooks(df(vecs), "id", "vec", m = 2, k = 2, rounds = 2)
    val codes = PqIndex.encode(df(vecs), "id", "vec", cb)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    // init ids 1,2: sub 0 starts with BOTH centroids at the low corner
    // (ids 1 and 2 agree there) — ties collapse everything to code 0;
    // sub 1 starts separated (id1 low, id2 high) and stays separated.
    assert(codes((1L, 1)) === 0 && codes((3L, 1)) === 0)
    assert(codes((2L, 1)) === 1 && codes((4L, 1)) === 1)
    // residuals: every point sits exactly ON a surviving centroid in
    // sub 1 (clusters {1,3} / {2,4} average to their common value)
    val res = PqIndex.encode(df(vecs), "id", "vec", cb)
      .filter(col("sub") === 1).select(sum(col("sqdist"))).head().getLong(0)
    assert(res === 0L)
  }

  test("ADC distance is the exact sum of per-subspace table entries") {
    // corpus of 3, query = id 9. ADC(q, v) must equal
    // sum_sub ||q_sub - centroid(code(v), sub)||^2 computed by hand
    // from the trained codebooks — asymmetric: exact query, coded v.
    val corpus = Seq(
      1L -> Seq(0.0, 0.0), 2L -> Seq(0.0, 0.4), 3L -> Seq(0.4, 0.0))
    val query = Seq(9L -> Seq(0.1, 0.1))
    val cb = PqIndex.codebooks(df(corpus), "id", "vec", m = 2, k = 3, rounds = 1)
    val codes = PqIndex.encode(df(corpus), "id", "vec", cb)
    val out = PqIndex.adcTopK(codes, cb, df(query), "id", "vec", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._3)
    // k=3, rounds=1: every vector is its own centroid (init = the 3
    // lowest ids), so ADC == exact quantized distance. q(0.1)=100000.
    val d1 = 2L * 100000L * 100000L            // to (0,0)
    val d2 = 100000L * 100000L + 300000L * 300000L // to (0,.4) and (.4,0)
    assert(out === Seq((1L, d1, 1), (2L, d2, 2), (3L, d2, 3)))
  }

  test("exactTopK is the ADC ranking when the codebook is saturated") {
    // k = corpus size, rounds = 1: every vector is its own centroid, so
    // ADC degenerates to the exact quantized distance — the two rankers
    // must agree row-for-row (the q_pq_recall ground-truth contract)
    val corpus = Seq(
      1L -> Seq(0.0, 0.0), 2L -> Seq(0.0, 0.4), 3L -> Seq(0.4, 0.0))
    val query = df(Seq(9L -> Seq(0.1, 0.1)))
    val cb = PqIndex.codebooks(df(corpus), "id", "vec", m = 2, k = 3, rounds = 1)
    val codes = PqIndex.encode(df(corpus), "id", "vec", cb)
    val adc = PqIndex.adcTopK(codes, cb, query, "id", "vec", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val ex = PqIndex.exactTopK(df(corpus), query, "id", "vec", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(adc.sortBy(_._4).toSeq === ex.sortBy(_._4).toSeq)
  }

  test("rank ties break to the lowest neighbor id") {
    val corpus = Seq(
      1L -> Seq(0.0, 0.0), 2L -> Seq(0.0, 0.4), 3L -> Seq(0.4, 0.0))
    val cb = PqIndex.codebooks(df(corpus), "id", "vec", m = 1, k = 3, rounds = 1)
    val codes = PqIndex.encode(df(corpus), "id", "vec", cb)
    val out = PqIndex.adcTopK(codes, cb, df(Seq(9L -> Seq(0.1, 0.1))),
      "id", "vec", k = 3).collect().map(r => (r.getLong(1), r.getInt(3)))
    // ids 2 and 3 are equidistant from the query — 2 must outrank 3
    assert(out.toSeq.sortBy(_._2).map(_._1) === Seq(1L, 2L, 3L))
  }

  test("partition layout never changes the result") {
    val vecs = (1L to 40L).map(i =>
      i -> Seq(0.01 * (i % 7), 0.03 * (i % 5), 0.02 * (i % 3), 0.05 * (i % 2)))
    def fit(parts: Int) = {
      val v = df(vecs).repartition(parts)
      val cb = PqIndex.codebooks(v, "id", "vec", m = 2, k = 3, rounds = 2)
      PqIndex.adcTopK(PqIndex.encode(v, "id", "vec", cb), cb,
        df(vecs.take(3)), "id", "vec", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).sortBy(x => (x._1, x._4)).toSeq
    }
    assert(fit(1) === fit(13))
  }

  test("guards raise loudly: ragged, null, and indivisible dims") {
    val ragged = Seq((1L, Seq(0.1, 0.2)), (2L, Seq(0.1))).toDF("id", "vec")
    val ex1 = intercept[IllegalArgumentException] {
      PqIndex.codebooks(ragged, "id", "vec", m = 2, k = 2, rounds = 1)
    }
    assert(ex1.getMessage.contains("ragged"))
    val withNull = Seq((1L, Seq(0.1, 0.2)), (2L, null)).toDF("id", "vec")
    val ex2 = intercept[IllegalArgumentException] {
      PqIndex.codebooks(withNull, "id", "vec", m = 2, k = 2, rounds = 1)
    }
    assert(ex2.getMessage.contains("NULL"))
    val ok = Seq((1L, Seq(0.1, 0.2, 0.3))).toDF("id", "vec")
    val ex3 = intercept[IllegalArgumentException] {
      PqIndex.codebooks(ok, "id", "vec", m = 2, k = 1, rounds = 1)
    }
    assert(ex3.getMessage.contains("not divisible"))
  }
}
