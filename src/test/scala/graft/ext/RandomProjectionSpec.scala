package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def df(vecs: Seq[(Long, Seq[Double])]) = vecs.toDF("id", "vec")

  private def proj(vecs: Seq[(Long, Seq[Double])], k: Int,
      seed: Long = 42L) =
    RandomProjection.project(df(vecs), "id", "vec", k, seed)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2)))
      .toMap

  test("projection is linear on grid-exact vectors") {
    // components are exact multiples of 1e-6, so quantization commutes
    // with addition and y(a + b) = y(a) + y(b) EXACTLY
    val a = Seq(0.25, -0.5, 0.125, 1.0)
    val b = Seq(0.75, 0.5, -0.625, -2.0)
    val sum = a.zip(b).map { case (x, y) => x + y }
    val p = proj(Seq(1L -> a, 2L -> b, 3L -> sum), k = 6)
    (0 until 6).foreach { j =>
      assert(p((1L, j)) + p((2L, j)) === p((3L, j)), s"dim $j")
    }
  }

  test("same seed reproduces; a different seed changes the projection") {
    val vecs = (1L to 5L).map(i => i -> Seq(0.1 * i, -0.2 * i, 0.3))
    assert(proj(vecs, 8) === proj(vecs, 8))
    assert(proj(vecs, 8) !== proj(vecs, 8, seed = 43L))
  }

  test("energy is preserved within a loose JL factor on the fixed " +
      "fixture") {
    // deterministic fixture + seeded signs → a stable, replayable
    // check that the projection neither collapses nor explodes scale:
    // mean_j y_j² should sit within 5× of Σ q² (E[y²] = Σq²)
    val v = Seq(0.3, -0.7, 0.2, 0.9, -0.4, 0.6, -0.1, 0.5)
    val p = proj(Seq(1L -> v), k = 16)
    val energy = (0 until 16).map(j => math.pow(p((1L, j)).toDouble, 2)).sum / 16
    val norm = v.map(x => math.pow(x * 1e6, 2)).sum
    assert(energy > norm / 5 && energy < norm * 5,
      s"energy $energy vs norm $norm")
  }

  test("partition layout never changes the projection") {
    val vecs = (1L to 40L).map(i =>
      i -> Seq(0.01 * (i % 7), 0.03 * (i % 5), 0.02 * (i % 3)))
    def fit(parts: Int) =
      RandomProjection.project(df(vecs).repartition(parts),
        "id", "vec", outDims = 4)
        .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2)))
        .toMap
    assert(fit(1) === fit(13))
  }
}
