package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the document→chunk expansion a
  * retrieval/embedding pipeline runs before vectorizing: fixed
  * `window`-token chunks starting every `stride` tokens (stride <
  * window ⇒ overlap, the standard recipe so no span straddles a chunk
  * boundary unseen). The sibling of [[SegmentDedup]]'s disjoint
  * blocks: same in-row construction, overlapping on purpose.
  *
  * Chunk count per doc is 1 + ⌈max(len − window, 0) / stride⌉ — the
  * max() keeps the arithmetic non-negative, which matters for engine
  * parity: Spark's `div` truncates toward zero while DuckDB's `//`
  * floors, and they only agree on non-negative operands (the oracle
  * mirrors this exact formula). A doc shorter than `window` yields
  * exactly its whole text as chunk 0; the final chunk truncates at the
  * document end (`slice` semantics, identical in both engines).
  *
  * Shape for 100 TB: tokenization, chunk starts, and the window slices
  * are all in-row codegen; the only expansion is the explode — output
  * rows ≈ tokens/stride per doc, the product a chunking pass exists to
  * materialize. No shuffle at all: chunking is a narrow map, and the
  * downstream embedding/bucketing step decides the partitioning.
  */
object Chunking {

  /** @return (idCol, chunk_idx, n_tok, chunk_text) — chunk_idx 0-based,
    *         n_tok the chunk's actual token count (< window only at the
    *         document tail). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window]: $stride")
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .withColumn("n_chunks", expr(
        s"CAST(1 + (greatest(size(toks) - $window, 0) + ${stride - 1}) " +
          s"div $stride AS INT)"))
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, n_chunks - 1), " +
          s"i -> slice(toks, i * $stride + 1, $window))"))
        .as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk")).as("n_tok"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }
}
