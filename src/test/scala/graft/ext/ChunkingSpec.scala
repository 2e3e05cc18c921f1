package graft.ext

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, window: Int, stride: Int) =
    Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", window, stride)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(_._1).toSeq

  test("overlapping windows cover the document with the stated stride") {
    val out = run("a b c d e f g h i j", window = 4, stride = 3)
    assert(out === Seq((0, 4, "a b c d"), (1, 4, "d e f g"),
      (2, 4, "g h i j")))
  }

  test("tail chunk truncates at the document end") {
    val out = run("a b c d e", window = 4, stride = 3)
    assert(out === Seq((0, 4, "a b c d"), (1, 2, "d e")))
  }

  test("short document is exactly one whole-text chunk") {
    assert(run("x y", window = 8, stride = 4) === Seq((0, 2, "x y")))
  }

  test("stride == window gives disjoint segment-dedup-style blocks") {
    val out = run("a b c d e f", window = 2, stride = 2)
    assert(out === Seq((0, 2, "a b"), (1, 2, "c d"), (2, 2, "e f")))
  }

  test("every token appears in at least one chunk (coverage property)") {
    for (len <- 1 to 25; stride <- Seq(2, 3, 5)) {
      val toks = (1 to len).map(i => s"t$i")
      val out = run(toks.mkString(" "), window = 5, stride = stride)
      val seen = out.flatMap(_._3.split(" ")).toSet
      assert(toks.forall(seen), s"len=$len stride=$stride lost tokens")
      // and chunk starts advance by exactly the stride
      assert(out.map(_._1) === out.indices.toSeq)
    }
  }
}
