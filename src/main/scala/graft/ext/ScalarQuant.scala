package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the third leg of the quantization family
  * next to [[PqIndex]] and [[IvfPq]] (FAISS's `SQ8`): each DIMENSION
  * gets an affine [min, max] range learned from the corpus, and each
  * component stores as one 8-bit code — 4× smaller than float32 with
  * far better fidelity than PQ's shared codebooks when dimensions are
  * independently scaled. Serving reconstructs the corpus side from
  * codes (midpoint rule) and ranks by exact integer L2 against the
  * raw query — the asymmetric-distance posture again.
  *
  * Integer-exact throughout (the shared 10⁻⁶ grid): ranges are BIGINT
  * min/max per dimension, codes are
  * `(255·(clamp(q) − qmin)) div max(qmax − qmin, 1)` and
  * reconstructions `qmin + ((2·code + 1)·(qmax − qmin)) div 510` —
  * every division runs on non-negative operands (clamp first), so
  * Spark `div` ≡ DuckDB `//` and train, encode, AND serve replay as
  * SQL (q_sq8_codes / q_ann_sq8). Out-of-range components of NEW
  * vectors clamp to the range ends — the append posture, spec-pinned.
  *
  * Scale shape: range learning is ONE pos-keyed aggregate (partial
  * min/max map-side — the exchange is dims × executors rows); encode
  * is a broadcast-ranges join over one corpus pass; the serve joins
  * codes to the broadcast ranges + broadcast query components on
  * `pos` and partial-aggregates the per-(query, vid) sum. The corpus
  * is touched once, as codes.
  */
object ScalarQuant {

  private val GRID = 1000000L

  /** Per-dimension quantization ranges: (pos, qmin, qmax) — dims×1
    * rows, broadcastable always. */
  def ranges(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    PqIndex.comps(vecs, idCol, vecCol, m = 1)
      .groupBy(col("pos"))
      .agg(min(col("q")).as("qmin"), max(col("q")).as("qmax"))

  /** 8-bit codes: (vid, pos, code). Components outside the learned
    * range (new vectors) CLAMP to the range ends before the division,
    * which also keeps every operand non-negative. */
  def encode(vecs: DataFrame, idCol: String, vecCol: String,
      rng: DataFrame): DataFrame =
    PqIndex.comps(vecs, idCol, vecCol, m = 1)
      .join(broadcast(rng), "pos")
      .select(col("vid"), col("pos"),
        expr("CAST((255 * (least(greatest(q, qmin), qmax) - qmin)) div " +
          "greatest(qmax - qmin, 1L) AS INT)").as("code"))

  /** The midpoint reconstruction of a (code, qmin, qmax) row — shared
    * by [[adcTopK]] and the distortion diagnostics. */
  private def recon =
    col("qmin") + expr("((2 * code + 1) * (qmax - qmin)) div 510")

  /** Asymmetric top-k: exact raw-query components vs the RECONSTRUCTED
    * corpus — Σ(qq − recon)² BIGINT, ties by (distance, id), self
    * excluded; the [[PqIndex.adcTopK]] output contract, so the recall
    * audit joins row-for-row against [[PqIndex.exactTopK]]. */
  def adcTopK(codes: DataFrame, rng: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val qc = PqIndex.comps(queries, idCol, vecCol, m = 1)
      .select(col("vid").as("qid"), col("pos"), col("q").as("qq"))
    val diff = col("qq") - recon
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc"), col("vid"))
    codes
      .join(broadcast(rng), "pos")
      .join(broadcast(qc), "pos")
      .groupBy(col("qid"), col("vid"))
      .agg(sum(diff * diff).as("adc"))
      .filter(col("qid") =!= col("vid"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("adc").as("adc_sqdist"), col("rk"))
  }
}
