package graft.ext

import graft.SparkSpec

/** SemDeDup drop-list contracts: transitive grouping (a chain whose
  * endpoints are NOT pairwise similar still collapses to one keeper),
  * keeper determinism (group minimum), and singleton preservation.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // all-positive components keep every vector in ONE sign bucket, so
  // recall is exact and the spec tests the grouping, not the LSH
  private def vec(main: Int, x: Float, y: Float): Seq[Float] = {
    val base = Array.fill(8)(0.01f)
    base(main) = x
    if (main + 1 < 8) base(main + 1) = y
    base.toSeq
  }

  test("chain collapses transitively; keeper is the group minimum; singletons survive") {
    // cluster A: 0°, 30°, 60° in dims (0,1) — cos(1,2)≈cos(2,3)≈0.87
    // clears 0.8, cos(1,3)≈0.51 does not: only the CLOSURE links 1 and 3
    val emb = Seq(
      (1L, vec(0, 1f, 0.01f)),
      (2L, vec(0, 0.866f, 0.5f)),
      (3L, vec(0, 0.5f, 0.866f)),
      // cluster B: two near-identical vectors on dim 2
      (4L, vec(2, 1f, 0.02f)),
      (5L, vec(2, 1f, 0.03f)),
      // singleton on dim 4
      (6L, vec(4, 1f, 0.01f))
    ).toDF("vec_id", "embedding")
    val drops = SemDedup
      .dropList(emb, "vec_id", "embedding", threshold = 0.8, bucketBits = 8)
      .as[(Long, Long)].collect().toSet
    assert(drops == Set((2L, 1L), (3L, 1L), (5L, 4L)))
  }

  test("nothing above threshold -> empty drop list") {
    val emb = Seq(
      (1L, vec(0, 1f, 0.01f)),
      (2L, vec(2, 1f, 0.01f)),
      (3L, vec(4, 1f, 0.01f))
    ).toDF("vec_id", "embedding")
    assert(SemDedup
      .dropList(emb, "vec_id", "embedding", threshold = 0.8, bucketBits = 8)
      .isEmpty)
  }
}
