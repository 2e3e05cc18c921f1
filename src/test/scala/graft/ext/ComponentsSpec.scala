package graft.ext

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("labels chains, cliques, and isolated pairs by their min member") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)
    ).toDF("doc_a", "doc_b")
    val out = Components.connected(edges, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long path converges (diameter rounds) and respects maxIter") {
    // path 0-1-2-...-9: diameter 9, min label must reach the far end
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val out = Components.connected(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet == Set(0L))
    // an insufficient round budget fails LOUDLY by default (unconverged
    // labels are silently-wrong clusters) and terminates either way
    intercept[IllegalStateException] {
      Components.connected(edges, "a", "b", maxIter = 2)
    }
    val bestEffort = Components.connected(edges, "a", "b", maxIter = 2,
      strict = false)
    assert(bestEffort.count() == 10)
  }

  test("self-loops and duplicate edges are harmless") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)).toDF("a", "b")
    val out = Components.connected(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }
}
