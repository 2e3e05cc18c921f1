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
}
