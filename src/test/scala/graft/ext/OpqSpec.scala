package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OPQ rotations: exact-integer orthogonality for the rational face,
  * Scala-replay exactness of the Spark pipeline, the m=1 ≡ KMeans
  * identity surviving rotation, and the parametric face lifting PQ
  * recall on the anisotropic data it exists for. */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  private def df(vecs: Seq[(Long, Seq[Double])]) = vecs.toDF("id", "vec")

  test("rational rotation: R·Rᵀ = denom²·I EXACTLY (integer arithmetic)") {
    val rot = Opq.rationalRotation(seed = 7, dim = 8, steps = 16)
    val d2 = BigInt(rot.denom) * BigInt(rot.denom)
    val n = rot.num.map(_.map(BigInt(_)))
    for (i <- n.indices; j <- n.indices) {
      val dot = n(i).zip(n(j)).map { case (a, b) => a * b }.sum
      assert(dot === (if (i == j) d2 else BigInt(0)),
        s"R·Rᵀ[$i][$j] = $dot")
    }
  }

  test("schedule is deterministic, pairs are distinct coordinates, and " +
      "different seeds give different rotations") {
    val s1 = Opq.schedule(7, 8, 16)
    assert(s1 === Opq.schedule(7, 8, 16))
    s1.foreach { case (p, q, s) =>
      assert(p >= 0 && q < 8 && p < q && (s == 1 || s == -1))
    }
    assert(Opq.rationalRotation(7, 8, 16).num.toSeq.map(_.toSeq) !==
      Opq.rationalRotation(8, 8, 16).num.toSeq.map(_.toSeq))
  }

  test("rotateExact ≡ a plain-Scala BigInt replay, including the " +
      "toward-zero truncation of negative dots (the DuckDB // rule)") {
    val vecs = Seq(
      1L -> Seq(0.30, -0.75, 0.01, 0.44, -0.20, 0.00, 0.91, -0.33),
      2L -> Seq(-0.90, 0.12, 0.55, -0.01, 0.27, -0.64, 0.08, 0.40))
    val rot = Opq.rationalRotation(seed = 3, dim = 8, steps = 16)
    val got = Opq.rotateExact(df(vecs), "id", "vec", rot)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    vecs.foreach { case (id, x) =>
      val q = x.map(v => math.round(v * 1e6))
      val expect = rot.num.map { row =>
        val u = row.zip(q).map { case (w, qq) => BigInt(w) * qq }.sum
        // BigInt / truncates toward zero — exactly the engine rule
        (u / BigInt(rot.denom)).toDouble / 1e6
      }.toSeq
      assert(got(id) === expect, s"id $id")
    }
  }

  test("rotated distances preserve ranking: exact top-k in rotated " +
      "space matches original-space exact top-k on a spread fixture") {
    // grid-exact values, distances well separated — the floor-div's
    // ±1-grid-unit perturbation cannot flip any rank here
    val vecs = (1L to 12L).map { i =>
      i -> Seq.tabulate(8)(d => ((i * 7 + d * 13) % 19).toDouble / 19.0)
    }
    val rot = Opq.rationalRotation(seed = 7, dim = 8, steps = 16)
    val rotated = Opq.rotateExact(df(vecs), "id", "vec", rot)
    val exOrig = PqIndex.exactTopK(df(vecs), df(vecs).filter(col("id") < 3),
      "id", "vec", k = 5).select("query_id", "neighbor_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exRot = PqIndex.exactTopK(rotated, rotated.filter(col("id") < 3),
      "id", "rvec", k = 5).select("query_id", "neighbor_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(exOrig === exRot)
  }

  test("m=1 ≡ KMeans survives rotation: PQ codebooks on the rotated " +
      "frame still reduce to Lloyd's bit-for-bit") {
    val vecs = Seq(
      1L -> Seq(0.00, 0.5), 2L -> Seq(0.01, 0.5), 3L -> Seq(0.02, 0.5),
      4L -> Seq(0.40, 0.1), 5L -> Seq(0.41, 0.1), 6L -> Seq(0.42, 0.1))
    val rot = Opq.rationalRotation(seed = 7, dim = 2, steps = 8)
    val rotated = Opq.rotateExact(df(vecs), "id", "vec", rot)
      .localCheckpoint()
    val km = KMeans.assignments(rotated, "id", "rvec", k = 2, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._1)
    val cb = PqIndex.codebooks(rotated, "id", "rvec", m = 1, k = 2,
      rounds = 2)
    val pq = PqIndex.encode(rotated, "id", "rvec", cb)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
      .sortBy(_._1)
    assert(pq === km)
  }

  test("parametric OPQ: orthonormal rows, and recall improves over raw " +
      "PQ on an anisotropic corpus (all variance in one subspace)") {
    // dim 8, m=4: the signal lives ENTIRELY in dims 0-1 — raw PQ wastes
    // three of its four codebooks on noise; the balanced PCA allocation
    // routes one strong direction to each subspace.
    val n = 40
    val vecs = (0L until n).map { i =>
      val a = ((i * 13) % 40).toDouble / 40.0
      val b = ((i * 29) % 40).toDouble / 40.0
      val noise = Seq.tabulate(6)(d => ((i * 7 + d * 11) % 17).toDouble / 1700.0)
      i -> (Seq(a, b) ++ noise)
    }
    val model = Opq.fitParametric(df(vecs), "vec", m = 4)
    // orthonormality of the PCA rotation (float tolerance)
    for (i <- model.rows.indices; j <- model.rows.indices) {
      val dot = model.rows(i).zip(model.rows(j))
        .map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"rows $i x $j = $dot")
    }
    def run(frame: org.apache.spark.sql.DataFrame,
        vc: String): (Long, Long) = {
      val cb = PqIndex.codebooks(frame, "id", vc, m = 4, k = 4, rounds = 3)
      val codes = PqIndex.encode(frame, "id", vc, cb).localCheckpoint()
      val distortion = codes.agg(sum(col("sqdist"))).head().getLong(0)
      val adc = PqIndex.adcTopK(codes, cb, frame.filter(col("id") < 4),
        "id", vc, k = 5).select(col("query_id"), col("neighbor_id"))
      val ex = PqIndex.exactTopK(df(vecs), df(vecs).filter(col("id") < 4),
        "id", "vec", k = 5)
        .select(col("query_id").as("q2"), col("neighbor_id").as("n2"))
      val hits = adc.join(ex, col("query_id") === col("q2") &&
          col("neighbor_id") === col("n2"), "left_semi").count()
      (distortion, hits)
    }
    val (rawDist, rawHits) = run(df(vecs), "vec")
    val rotated = Opq.rotate(df(vecs), "id", "vec", model)
      .localCheckpoint()
    val (opqDist, opqHits) = run(rotated, "rvec")
    // distortion is the OPQ objective — it must STRICTLY improve (the
    // fill-keyed allocation pairs each strong direction with a weak
    // one, so no single codebook models a 2-D cloud); measured ×3.1
    // down, and recall follows on this fixture
    assert(opqDist < rawDist, s"OPQ distortion $opqDist !< raw $rawDist")
    assert(opqHits > rawHits, s"OPQ recall $opqHits !> raw PQ $rawHits")
  }
}
