package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def df(vecs: Seq[(Long, Seq[Double])]) = vecs.toDF("id", "vec")

  test("nLists=1 reduces to plain PQ shifted by the global centroid") {
    // one coarse list, coarseRounds=1: the coarse centroid is the
    // lowest-id vector, so every residual is a CONSTANT shift of the
    // raw components — Lloyd's is translation-invariant on the integer
    // grid (init ids, distances, and means all shift together), so
    // codes and residual sqdists must equal PqIndex's bit-for-bit, and
    // with nProbe=1 so must the full ADC ranking.
    val vecs = Seq(
      1L -> Seq(0.00, 0.5, 0.3, 0.0), 2L -> Seq(0.01, 0.5, 0.31, 0.0),
      3L -> Seq(0.40, 0.1, 0.0, 0.2), 4L -> Seq(0.41, 0.1, 0.01, 0.2),
      5L -> Seq(0.20, 0.9, 0.5, 0.7), 6L -> Seq(0.21, 0.9, 0.51, 0.7))
    val model = IvfPq.train(df(vecs), "id", "vec",
      nLists = 1, coarseRounds = 1, m = 2, k = 3, pqRounds = 2)
    val ivf = IvfPq.encode(df(vecs), "id", "vec", model)
      .collect().map(r => ((r.getLong(0), r.getInt(2)), (r.getInt(3), r.getLong(4))))
      .toMap
    val cb = PqIndex.codebooks(df(vecs), "id", "vec", m = 2, k = 3, rounds = 2)
    val pq = PqIndex.encode(df(vecs), "id", "vec", cb)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getLong(3))))
      .toMap
    assert(ivf === pq)
    val ivfTop = IvfPq.adcTopK(IvfPq.encode(df(vecs), "id", "vec", model),
      model, df(vecs.take(2)), "id", "vec", k = 5, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    val pqTop = PqIndex.adcTopK(PqIndex.encode(df(vecs), "id", "vec", cb),
      cb, df(vecs.take(2)), "id", "vec", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    assert(ivfTop === pqTop)
  }

  test("coarse routing equals the integer KMeans assignment") {
    val vecs = (1L to 30L).map(i =>
      i -> Seq(0.02 * (i % 5), 0.04 * (i % 3), 0.01 * (i % 7), 0.03 * (i % 2)))
    val model = IvfPq.train(df(vecs), "id", "vec",
      nLists = 3, coarseRounds = 2, m = 2, k = 2, pqRounds = 1)
    val lists = IvfPq.encode(df(vecs), "id", "vec", model)
      .select(col("vid"), col("list_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val km = KMeans.assignments(df(vecs), "id", "vec", k = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(lists === km)
  }

  test("ADC with a saturated codebook is the exact in-list distance") {
    // two well-separated groups; k = corpus size and pqRounds = 1 make
    // every residual its own PQ centroid, so for v in a probed list
    // ADC(q, v) = ||(q - c) - (v - c)||^2 = the exact quantized
    // distance — the shared coarse centroid cancels.
    val vecs = Seq(
      1L -> Seq(0.00, 0.01), 2L -> Seq(0.02, 0.00), 3L -> Seq(0.01, 0.03),
      4L -> Seq(0.90, 0.91), 5L -> Seq(0.92, 0.90), 6L -> Seq(0.91, 0.93))
    val model = IvfPq.train(df(vecs), "id", "vec",
      nLists = 2, coarseRounds = 2, m = 2, k = 6, pqRounds = 1)
    val codes = IvfPq.encode(df(vecs), "id", "vec", model)
    val out = IvfPq.adcTopK(codes, model, df(vecs), "id", "vec",
      k = 5, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // nProbe=1 on separated groups: neighbors stay within the group
    val group = Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2, 6L -> 2)
    assert(out.forall { case (q, n, _) => group(q) == group(n) })
    def quant(x: Double) = math.round(x * 1000000L)
    val byId = vecs.toMap
    out.foreach { case (q, n, adc) =>
      val exact = byId(q).zip(byId(n))
        .map { case (a, b) => val d = quant(a) - quant(b); d * d }.sum
      assert(adc === exact, s"query $q neighbor $n")
    }
  }

  test("unprobed lists are invisible; widening nProbe reveals them") {
    val vecs = Seq(
      1L -> Seq(0.00, 0.00), 2L -> Seq(0.05, 0.00),
      3L -> Seq(0.90, 0.90), 4L -> Seq(0.95, 0.90))
    val model = IvfPq.train(df(vecs), "id", "vec",
      nLists = 2, coarseRounds = 2, m = 1, k = 4, pqRounds = 1)
    val codes = IvfPq.encode(df(vecs), "id", "vec", model)
    val q = df(Seq(1L -> Seq(0.00, 0.00)))
    val narrow = IvfPq.adcTopK(codes, model, q, "id", "vec", k = 4, nProbe = 1)
      .select(col("neighbor_id")).as[Long].collect().toSet
    assert(narrow === Set(2L))
    val wide = IvfPq.adcTopK(codes, model, q, "id", "vec", k = 4, nProbe = 2)
      .select(col("neighbor_id")).as[Long].collect().toSet
    assert(wide === Set(2L, 3L, 4L))
  }

  test("refine with full probes and full rerank IS the exact ranking") {
    // nProbe = nLists and rerank = corpus size: every vector is a
    // candidate, so the exact re-rank must reproduce exactTopK
    // row-for-row no matter how lossy the codes are
    val vecs = (1L to 20L).map(i =>
      i -> Seq(0.05 * (i % 4), 0.03 * (i % 5), 0.02 * (i % 3), 0.04 * (i % 2)))
    val model = IvfPq.train(df(vecs), "id", "vec",
      nLists = 2, coarseRounds = 2, m = 2, k = 2, pqRounds = 1)
    val codes = IvfPq.encode(df(vecs), "id", "vec", model)
    val q = df(vecs.take(2))
    val refined = IvfPq.adcRefineTopK(codes, model, q, df(vecs),
      "id", "vec", k = 5, nProbe = 2, rerank = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    val exact = PqIndex.exactTopK(df(vecs), q, "id", "vec", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    assert(refined === exact)
  }

  test("partition layout never changes the result") {
    val vecs = (1L to 40L).map(i =>
      i -> Seq(0.01 * (i % 7), 0.03 * (i % 5), 0.02 * (i % 3), 0.05 * (i % 2)))
    def fit(parts: Int) = {
      val v = df(vecs).repartition(parts)
      val model = IvfPq.train(v, "id", "vec",
        nLists = 3, coarseRounds = 2, m = 2, k = 3, pqRounds = 2)
      IvfPq.adcTopK(IvfPq.encode(v, "id", "vec", model), model,
        df(vecs.take(3)), "id", "vec", k = 5, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).sortBy(x => (x._1, x._4)).toSeq
    }
    assert(fit(1) === fit(13))
  }
}
