package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class EmbedEvalSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.toSeq.toDF("vec_id", "embedding")

  test("truncation that preserves order gives perfect recall") {
    // information lives in the first 2 dims; trailing dims are zero
    val corpus = vecs(
      0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0.9f, 0.1f, 0f, 0f),
      2L -> Seq(0.5f, 0.5f, 0f, 0f), 3L -> Seq(0f, 1f, 0f, 0f))
    val out = EmbedEval.truncationRecall(corpus,
        corpus.filter($"vec_id" === 0L), "vec_id", "embedding",
        dims = 2, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((0L, 2L)))
  }

  test("truncation that destroys the signal is measured, not hidden") {
    // neighbors differ ONLY in the trailing dims: at dims=2 every
    // candidate ties and the id tiebreak picks a different top-1 set
    val corpus = vecs(
      0L -> Seq(1f, 0f, 0.9f, 0f), 1L -> Seq(1f, 0f, 0.89f, 0f),
      2L -> Seq(1f, 0f, -0.9f, 0f), 3L -> Seq(1f, 0f, -0.89f, 0f))
    val full = EmbedEval.truncationRecall(corpus,
        corpus.filter($"vec_id" === 0L), "vec_id", "embedding",
        dims = 4, k = 1)
      .collect().head.getLong(1)
    assert(full === 1L) // dims=4 is the identity evaluation
    val cut = EmbedEval.truncationRecall(corpus,
        corpus.filter($"vec_id" === 0L), "vec_id", "embedding",
        dims = 2, k = 1)
      .collect().head.getLong(1)
    assert(cut === 1L) // ties at dims=2 break by id: picks 1, still in full top-1
  }

  test("dims beyond the stored dimension are rejected, not a silent no-op") {
    // review r11: slice() clamps, so dims=128 on 64-dim vectors would
    // report a perfect recall for a truncation that never happened
    val corpus = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
    val e = intercept[IllegalArgumentException] {
      EmbedEval.truncationRecall(corpus, corpus, "vec_id", "embedding",
        dims = 3, k = 1).collect()
    }
    assert(e.getMessage.contains("exceeds the smallest stored dimension"))
  }

  test("mixed-dimension corpora and empty query frames are rejected " +
      "(review r12: head() checked only the first row)") {
    // dims=3 passes the FIRST row's size but no-ops on the 2-dim row —
    // the aggregate validation must catch the smallest vector anywhere
    val corpus = vecs(0L -> Seq(1f, 0f, 1f, 1f), 1L -> Seq(0f, 1f))
    val e = intercept[IllegalArgumentException] {
      EmbedEval.truncationRecall(corpus, corpus.filter($"vec_id" === 0L),
        "vec_id", "embedding", dims = 3, k = 1).collect()
    }
    assert(e.getMessage.contains("exceeds the smallest stored dimension"))
    val empty = intercept[IllegalArgumentException] {
      EmbedEval.truncationRecall(corpus.filter($"vec_id" < 0),
        corpus.filter($"vec_id" < 0), "vec_id", "embedding",
        dims = 1, k = 1).collect()
    }
    assert(empty.getMessage.contains("non-empty"))
  }

  test("a NULL vector fails with words, not an opaque NPE " +
      "(review r12: min() skips nulls, getInt then blew up)") {
    val corpus = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
      .unionByName(Seq(Tuple1(2L)).toDF("vec_id")
        .withColumn("embedding",
          org.apache.spark.sql.functions.lit(null)
            .cast("array<float>")))
    val e = intercept[IllegalArgumentException] {
      EmbedEval.truncationRecall(corpus, corpus.filter($"vec_id" === 0L),
        "vec_id", "embedding", dims = 1, k = 1).collect()
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("zero-overlap queries report 0 instead of vanishing") {
    val corpus = vecs(
      0L -> Seq(1f, 0f, 0f, 1f), 1L -> Seq(1f, 0f, 0f, 0.9f),
      2L -> Seq(-1f, 0f, 0f, 0.95f), 3L -> Seq(0f, 1f, 0f, -1f))
    // full top-1 of query 0 is driven by dim 4 agreement; at dims=3 the
    // dim-1 sign dominates and flips the winner
    val out = EmbedEval.truncationRecall(corpus,
        corpus.filter($"vec_id" === 0L), "vec_id", "embedding",
        dims = 3, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out.length === 1)
    assert(out.head._3 === 1)
    assert(out.head._2 >= 0L && out.head._2 <= 1L)
  }
}
