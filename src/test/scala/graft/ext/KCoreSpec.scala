package graft.ext

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  // K4 (nodes 1-4, complete) + a tail 4-5-6 chain + a dupe/self-loop
  private def edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L), (6L, 6L), (2L, 1L)
  ).toDF("src", "dst")

  test("2-core peels the chain tail but keeps the clique") {
    val out = KCore.survivors(edges, "src", "dst", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // round 1 removes 6 (deg 1), round 2 removes 5, round 3 removes
    // nothing: 4's degree falls to 3, still >= 2
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("4-core of K4 is empty (max degree is 3)") {
    assert(KCore.survivors(edges, "src", "dst", k = 4, rounds = 2)
      .count() == 0L)
  }

  test("shuffle fallback (broadcastKeep=false) matches the broadcast path") {
    // the >10^8-node path: per-round keep set joined by shuffle, not
    // broadcast — must be result-identical to the default
    val viaBroadcast = KCore.survivors(edges, "src", "dst", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    val viaShuffle = KCore.survivors(edges, "src", "dst", k = 2, rounds = 3,
      broadcastKeep = false).as[(Long, Long)].collect().toMap
    assert(viaShuffle == viaBroadcast)
  }

  test("insufficient rounds report the partially peeled state") {
    // after ONE round only node 6 is gone; 5 survives with deg 1 (4-5)
    val out = KCore.survivors(edges, "src", "dst", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(out(5L) == 1L && !out.contains(6L))
  }
}
