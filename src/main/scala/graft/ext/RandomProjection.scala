package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded sign random projection (Achlioptas 2003's ±1 variant of
  * Johnson–Lindenstrauss): reduce a D-dim embedding to `outDims`
  * components y_j = Σ_i s(i, j)·q_i with s ∈ {−1, +1} drawn from the
  * engine-shared seeded coin (md5 first-nibble parity — the
  * simhash/walks precedent), on the exact integer grid. The standard
  * preprocessing
  * step ahead of ANN indexing or sketching when D is large: distances
  * are preserved within (1 ± ε) for outDims = O(log N / ε²), and
  * because the "randomness" is a hash of (seed, i, j), the projection
  * is REPRODUCIBLE across engines, partitionings, and runs — so the
  * projected table itself hash-gates (q_random_projection), which no
  * RNG-matrix implementation can offer.
  *
  * Scale shape: one pass — components explode ×outDims (the map-side
  * row blowup IS the compute), partial-aggregated (vid, j) sums keep
  * the exchange at N·outDims longs. No matrix materializes anywhere:
  * the sign is computed inline per (pos, j), so the operator has no
  * driver state at all. Overflow: |y_j| ≤ D·max|q| — at the 10⁻⁶ grid
  * and |x| ≤ 10³ that is 10⁹·D, safe for any realistic D; the output
  * stays BIGINT for downstream exact arithmetic.
  */
object RandomProjection {

  /** (vid, j, y): the projected integer components, outDims rows per
    * vector. */
  def project(vecs: DataFrame, idCol: String, vecCol: String,
      outDims: Int, seed: Long = 42L): DataFrame = {
    require(outDims >= 1, s"outDims must be >= 1: $outDims")
    val nib = conv(substring(
      md5(concat_ws("|", lit(seed), col("pos"), col("j"))), 1, 1),
      16, 10).cast("int")
    PqIndex.comps(vecs, idCol, vecCol, m = 1)
      .select(col("vid"), col("pos"), col("q"),
        explode(expr(s"sequence(0, ${outDims - 1})")).as("j"))
      .select(col("vid"), col("j"),
        (when(nib % 2 === 0, lit(1L)).otherwise(lit(-1L)) * col("q"))
          .as("term"))
      .groupBy(col("vid"), col("j"))
      .agg(sum(col("term")).as("y"))
  }
}
