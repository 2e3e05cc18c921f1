package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level EXACT segment deduplication with document
  * reconstruction — the C4/CCNet "drop every line seen elsewhere, keep
  * the first occurrence, reassemble the document" curation pass,
  * generalized to fixed-width token blocks (the corpus's documents are
  * single-line token streams, so the dedup unit is a B-token block
  * rather than a newline-delimited line; the operator shape — exact
  * segment key, global keep-first, ordered reassembly — is identical).
  *
  * Distinct from [[SpanDedup]] (winnowing FINDS overlapping spans but
  * rewrites nothing) and [[Dedup.exact]] (whole-document): this is the
  * pass that REMOVES repeated boilerplate segments and emits the
  * cleaned text.
  *
  * Keep-first rule: for each distinct block text, the lexicographically
  * smallest (doc_id, block_idx) occurrence survives; every other
  * occurrence is dropped. Deterministic by construction — no
  * run-dependent "first seen" ordering.
  *
  * Shape for 100 TB, and why it is NOT a window:
  *   1. blocks are built IN-ROW (`sequence` + `slice` + `array_join`,
  *      all codegen) — the explode multiplies rows by ⌈tokens/B⌉ only;
  *   2. the keeper per block is `min(doc_id·2²⁰ + bidx)` — (doc_id,
  *      bidx) packed into ONE long so the aggregate is a primitive
  *      `min`, which Spark executes as a whole-stage-codegen
  *      HashAggregate with MAP-SIDE COMBINE (a `min(struct(...))`
  *      falls back to SortAggregate; a `row_number() OVER (PARTITION
  *      BY block)` window would ship every copy of a million-times-
  *      repeated hot block — exactly the case this operator exists
  *      for — to one sorted task). Packing preserves lexicographic
  *      order because bidx < 2²⁰; preconditions below;
  *   3. reassembly is a second hash aggregate on doc_id, and the final
  *      per-doc join is a co-partitioned long-key join.
  * Two shuffles total, both partial-aggregatable, no ordered window
  * anywhere.
  */
object SegmentDedup {

  /** Position bits in the packed (doc_id, bidx) keeper key: documents
    * may hold up to 2²⁰ blocks (8M+ tokens at B=8) and ids must fit
    * 43 bits non-negative — both enforced. */
  private val PosBits = 20

  /** @param blockTokens segment width B in tokens (text split on single
    *                    spaces; empty text yields one empty block, which
    *                    then deduplicates corpus-wide like any block)
    * @return (idCol, n_blocks, n_kept, text_kept) — one row per input
    *         document; documents whose every block lost keep-first come
    *         back with n_kept=0 and text_kept="". */
  def dedupSegments(docs: DataFrame, idCol: String, textCol: String,
                    blockTokens: Int): DataFrame = {
    require(blockTokens >= 1, s"blockTokens must be >= 1: $blockTokens")
    val B = blockTokens

    // materialized once: the tokenized corpus feeds BOTH the block
    // pipeline and the final (id, n_blocks) join — without the
    // checkpoint the corpus scan + split would run twice (AQE does not
    // reuse sibling stages; the Relevance.bm25 discipline)
    val toked = docs.select(col(idCol),
      split(col(textCol), " ").as("toks"))
      .withColumn("n_blocks",
        expr(s"CAST((size(toks) + ${B - 1}) div $B AS INT)"))
      .localCheckpoint()

    // in-row block construction, then one explode: (id, bidx, block);
    // the packed keeper key rides along (guarded — a violation would
    // otherwise silently misorder keep-first)
    val guarded = assert_true(
      col(idCol) >= 0 && col(idCol) < (1L << (63 - PosBits)) &&
        col("bidx") < (1 << PosBits),
      lit(s"SegmentDedup: id must be in [0, 2^${63 - PosBits}) and " +
        s"blocks per doc < 2^$PosBits"))
    val blocks = toked.select(col(idCol), posexplode(
      expr(s"transform(sequence(0, n_blocks - 1), " +
        s"i -> array_join(slice(toks, i * $B + 1, $B), ' '))"))
      .as(Seq("bidx", "block")))
      .withColumn("pk", when(guarded.isNull,
        shiftleft(col(idCol).cast("long"), PosBits) + col("bidx")))

    // global keep-first per distinct block text — primitive min over the
    // packed key: codegen HashAggregate, map-side combined (hot blocks
    // collapse before the shuffle)
    val keepers = blocks
      .groupBy(col("block"))
      .agg(min(col("pk")).as("pk"))
      .select(shiftrightunsigned(col("pk"), PosBits).as(idCol),
        (col("pk") % lit(1 << PosBits)).cast("int").as("bidx"),
        col("block"))

    // ordered reassembly of each survivor set
    val recon = keepers
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
            array_sort(collect_list(struct(col("bidx"), col("block")))),
            s => s("block")), " ").as("text_kept"))

    toked.select(col(idCol), col("n_blocks"))
      .join(recon, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }
}
