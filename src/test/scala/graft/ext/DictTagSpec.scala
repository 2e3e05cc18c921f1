package graft.ext

import graft.SparkSpec

class DictTagSpec extends SparkSpec {
  import spark.implicits._

  private def tag(docs: Seq[(Long, String)], phrases: Seq[(String, String)]) =
    DictTag.tagPhrases(docs.toDF("id", "text"), "id", "text",
        phrases.toDF("pid", "phrase"), "pid", "phrase")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  test("whole-token matching: no substring false positives") {
    val docs = Seq(1L -> "the catalog of cats", 2L -> "a cat sat")
    val p = tag(docs, Seq("p_cat" -> "cat"))
    assert(p === Map((2L, "p_cat") -> 1L)) // "catalog"/"cats" don't match
  }

  test("multi-token phrases match across exact windows with counts") {
    val docs = Seq(
      1L -> "hash join beats nested loop hash join",
      2L -> "hash only")
    val p = tag(docs, Seq("p_hj" -> "hash join", "p_nl" -> "nested loop"))
    assert(p === Map((1L, "p_hj") -> 2L, (1L, "p_nl") -> 1L))
  }

  test("mixed lengths in one dictionary; case-insensitive tokens") {
    val docs = Seq(1L -> "Sort Merge JOIN on a sort key")
    val p = tag(docs, Seq("p3" -> "sort merge join", "p1" -> "sort",
      "p_absent" -> "bloom filter"))
    assert(p === Map((1L, "p3") -> 1L, (1L, "p1") -> 2L))
  }

  test("documents shorter than a phrase are safe (no descending windows)") {
    val docs = Seq(1L -> "tiny", 2L -> "a b")
    val p = tag(docs, Seq("p4" -> "one two three four"))
    assert(p.isEmpty)
  }

  test("overlapping windows all count") {
    val docs = Seq(1L -> "a a a a")
    assert(tag(docs, Seq("p" -> "a a")) === Map((1L, "p") -> 3L))
  }
}
