package graft.ext

import graft.SparkSpec

class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], b: Int) =
    SegmentDedup.dedupSegments(docs.toDF("doc_id", "text"),
      "doc_id", "text", blockTokens = b)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq

  test("repeated block survives only at its first (doc, position)") {
    val out = run(Seq(
      1L -> "a b c d",   // blocks (B=2): "a b", "c d"
      2L -> "c d e f",   // "c d" is a dup of doc1's second block
      3L -> "a b a b"    // both blocks dup doc1's first
    ), b = 2)
    assert(out === Seq(
      (1L, 2, 2L, "a b c d"),
      (2L, 2, 1L, "e f"),
      (3L, 2, 0L, "")))
  }

  test("within-document repetition keeps the earliest position") {
    val out = run(Seq(5L -> "x y x y z w"), b = 2)
    assert(out === Seq((5L, 3, 2L, "x y z w")))
  }

  test("ragged tail block is a real (shorter) segment") {
    val out = run(Seq(1L -> "p q r", 2L -> "r"), b = 2)
    // doc1: "p q" + tail "r"; doc2's sole block "r" duplicates the tail
    assert(out === Seq((1L, 2, 2L, "p q r"), (2L, 1, 0L, "")))
  }

  test("disjoint corpora pass through untouched") {
    val docs = Seq(1L -> "aa bb cc", 2L -> "dd ee ff", 3L -> "gg hh")
    val out = run(docs, b = 4)
    assert(out.map(d => (d._1, d._4)) === docs)
    assert(out.forall(d => d._2 == 1 && d._3 == 1L))
  }

  test("empty text is one empty block and dedups corpus-wide") {
    val out = run(Seq(1L -> "", 2L -> ""), b = 8)
    assert(out === Seq((1L, 1, 1L, ""), (2L, 1, 0L, "")))
  }

  test("keep-first tiebreak is doc_id order, not input order") {
    val out = run(Seq(9L -> "k k", 4L -> "k k"), b = 2)
    assert(out === Seq((4L, 1, 1L, "k k"), (9L, 1, 0L, "")))
  }

  test("partition invariance: keep-first ignores input layout") {
    val docs = (1L to 40L).map(i =>
      (i, (0 until 6).map(j => s"w${(i * 7 + j) % 23}").mkString(" ")))
    def run(parts: Int) =
      SegmentDedup.dedupSegments(docs.toDF("doc_id", "text")
          .repartition(parts), "doc_id", "text", blockTokens = 3)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
        .sortBy(_._1).toSeq
    assert(run(1) === run(9))
  }

  test("idempotence: re-running on kept text changes nothing") {
    val once = run(Seq(1L -> "a b c d", 2L -> "c d e f", 3L -> "e f"), b = 2)
    val again = run(once.map(r => (r._1, r._4)).filter(_._2.nonEmpty), b = 2)
    for (r <- again) {
      val prev = once.find(_._1 == r._1).get
      assert(r._4 === prev._4, s"doc ${r._1} changed on second pass")
    }
  }
}
