package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GramSpec extends SparkSpec {
  import spark.implicits._

  test("second moment matches the naive driver-side computation") {
    val vecs = Seq(
      1L -> Seq(0.1, -0.2, 0.3),
      2L -> Seq(0.0, 0.5, -0.1),
      3L -> Seq(0.25, 0.25, 0.25))
    val out = Gram.secondMoment(vecs.toDF("id", "vec"), "vec")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val q = vecs.map(_._2.map(x => math.round(x * 1e6)))
    for (i <- 0 until 3; j <- i until 3)
      assert(out((i, j)) === q.map(v => v(i) * v(j)).sum, s"S[$i][$j]")
    for (j <- 0 until 3)
      assert(out((-1, j)) === q.map(v => v(j)).sum, s"mean[$j]")
    assert(out((-1, -1)) === 3L)
  }

  test("an empty vector contributes only its count row (no crash)") {
    // regression: sequence(0, -1) is DESCENDING in Spark — an unguarded
    // expansion reaches element_at(qv, 0) and throws
    val vecs = Seq(1L -> Seq(0.5), 2L -> Seq.empty[Double])
    val out = Gram.secondMoment(vecs.toDF("id", "vec"), "vec")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out((-1, -1)) === 2L)        // both rows counted
    assert(out((0, 0)) === 500000L * 500000L) // only the real vector sums
    assert(out((-1, 0)) === 500000L)
  }

  test("PC1 recovers the dominant direction of a stretched cloud") {
    // points along (3,4)/5 with small orthogonal noise
    val dir = Seq(0.6, 0.8)
    val vecs = (1L to 50L).map { i =>
      val t = (i.toDouble - 25.5) / 50.0       // spread along dir
      val o = math.sin(i.toDouble) * 0.01      // tiny orthogonal jitter
      i -> Seq(t * dir(0) - o * dir(1), t * dir(1) + o * dir(0))
    }
    val m = Gram.fitPca(vecs.toDF("id", "vec"), "vec", 2)
    val pc1 = m.components(0)
    val cos = pc1(0) * dir(0) + pc1(1) * dir(1)
    assert(math.abs(math.abs(cos) - 1.0) < 1e-3,
      s"PC1 ${pc1.toSeq} not aligned with $dir")
    // orthonormality of the returned basis
    val n1 = pc1(0) * pc1(0) + pc1(1) * pc1(1)
    val pc2 = m.components(1)
    val d12 = pc1(0) * pc2(0) + pc1(1) * pc2(1)
    assert(math.abs(n1 - 1.0) < 1e-9 && math.abs(d12) < 1e-9)
  }

  test("projection is centered: the projected cloud has ~zero mean") {
    val vecs = (1L to 30L).map(i =>
      i -> Seq(0.5 + math.sin(i * 1.0) * 0.1, -0.2 + math.cos(i * 2.0) * 0.05))
    val df = vecs.toDF("id", "vec")
    val m = Gram.fitPca(df, "vec", 2)
    val proj = Gram.project(df, "id", "vec", m)
      .select(explode(col("pc")).as("p")).agg(avg(col("p"))).head.getDouble(0)
    // the model mean lives on the 1e-6 quantization grid while project
    // reads raw doubles, so the residual is bounded by ‖v‖·‖μ_grid−μ‖
    // ≈ √dim·5e-7 — not exactly zero
    assert(math.abs(proj) < 2e-6, s"projected mean $proj")
  }

  test("fit and projection are invariant to input partitioning") {
    val vecs = (1L to 40L).map(i =>
      i -> Seq(math.sin(i * 0.3), math.cos(i * 0.9), math.sin(i * 1.7)))
    val df1 = vecs.toDF("id", "vec")
    val df2 = vecs.toDF("id", "vec").repartition(7, col("id"))
    val m1 = Gram.fitPca(df1, "vec", 2)
    val m2 = Gram.fitPca(df2, "vec", 2)
    assert(m1.components.flatten.toSeq === m2.components.flatten.toSeq)
    val p1 = Gram.project(df1, "id", "vec", m1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p2 = Gram.project(df2, "id", "vec", m2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 === p2)
  }
}
