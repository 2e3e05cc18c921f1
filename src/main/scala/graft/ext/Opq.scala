package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rotations ahead of product quantization — the OPQ family (Ge et al.
  * CVPR 2013, "Optimized Product Quantization"; FAISS `OPQMatrix` /
  * `RandomRotationMatrix`): PQ quantizes each subspace independently,
  * so axis-aligned correlation or unbalanced per-subspace variance
  * costs recall; an orthonormal rotation applied BEFORE the subspace
  * split removes exactly that failure mode. Two faces, two jobs:
  *
  *  - [[fitParametric]] — parametric OPQ: PCA from the one-pass gram
  *    summary ([[Gram.fitEig]] — the corpus is never touched per
  *    component), then eigenvalue-BALANCED allocation of principal
  *    directions to the m subspaces (greedy min-log-product bucket
  *    fill, the OPQ paper's closed-form solution for Gaussian data).
  *    Plain PCA ordering would dump ALL variance into subspace 0 —
  *    strictly worse for PQ; the balancing is the point. Driver state
  *    = dim×(dim+1) doubles, the [[Gram.fitPca]] budget.
  *    HONEST LIMIT, measured on this corpus and documented in
  *    COVERAGE.md: the synthetic embeddings are near-isotropic
  *    (eigenvalue spectrum 0.028…0.016, |corr| ≤ 0.18), so NO rotation
  *    can move PQ recall here beyond noise — the operator earns its
  *    keep on correlated real corpora, which the OpqSpec fixture
  *    demonstrates; on isotropic data the recall lever is codebook
  *    capacity (q_pq_recall_tuned), not rotation.
  *
  *  - [[rationalRotation]]/[[rotateExact]] — a seeded orthonormal
  *    rotation with EXACT INTEGER arithmetic end-to-end: a fixed chain
  *    of (3,4,5) Givens steps (cos=3/5, sin=4/5 — exact rationals, no
  *    libm, no float-order hazards) composed into one integer matrix R
  *    with common denominator 5^steps; rotated components are BIGINT
  *    dot products floor-divided back to the 10⁻⁶ grid. Every quantity
  *    replays bit-for-bit in SQL (the q_opq_recall oracle rebuilds R
  *    from the same step literals and integer sums are order-free), so
  *    the rotation+PQ+recall pipeline hash-gates at all three SFs —
  *    the property no float rotation can offer the driver gate.
  *
  * Scale shape: both rotations apply as ONE in-row literal expression
  * chain per output dimension ([[Gram.project]]'s pattern) — map-only,
  * codegen, zero joins, zero shuffles, one corpus pass.
  */
object Opq {

  private val GRID = 1e6

  /** An orthonormal rotation as rows-of-output-dims + the input means
    * (subtracted before rotating; distances are translation-invariant,
    * and centering keeps the rotated values in the input's scale). */
  final case class RotationModel(rows: Array[Array[Double]],
      means: Array[Double])

  /** Parametric OPQ rotation for an m-subspace PQ: PCA directions
    * allocated to subspaces by GREEDY BALANCED eigenvalue product —
    * descending eigenvalues, each assigned to the LEAST-FILLED bucket
    * first and, among equally filled, the one with the smallest running
    * Σ log λ (ties to the lowest index — deterministic). The fill-level
    * primary key matters: a pure min-log-product greedy DEGENERATES for
    * λ < 1 (log λ < 0 makes a bucket more attractive the more it
    * holds), stacking every strong direction into bucket 0 — the exact
    * opposite of the OPQ objective (measured 3.7× WORSE distortion than
    * raw PQ). With the fill key the greedy produces the serpentine
    * strong-with-weak pairing: each subspace's eigenvalue PRODUCT —
    * the per-subspace Gaussian distortion driver (Ge et al., OPQ-P) —
    * balances, so no codebook is forced to model a genuinely
    * multi-directional cloud while others encode noise (measured on the
    * OpqSpec fixture: distortion ×3.1 down, recall 12 → 15 of 20). */
  def fitParametric(vecs: DataFrame, vecCol: String, m: Int)
      : RotationModel = {
    require(m >= 1, s"m must be >= 1: $m")
    val eig = Gram.fitEig(vecs, vecCol)
    val dim = eig.means.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val buckets = Array.fill(m)(Vector.empty[Int])
    val logSum = Array.fill(m)(0.0)
    (0 until dim).foreach { i =>
      val open = (0 until m).filter(b => buckets(b).size < subDim)
      val b = open.minBy(b => (buckets(b).size, logSum(b), b))
      buckets(b) :+= i
      logSum(b) += math.log(math.max(eig.eigenvalues(i), 1e-300))
    }
    val order = buckets.flatten
    RotationModel(order.map(eig.components(_)).toArray, eig.means)
  }

  /** (id, rvec): mean-centered rotation as a literal dot-product chain
    * — the [[Gram.project]] shape with k = dim. */
  def rotate(vecs: DataFrame, idCol: String, vecCol: String,
      model: RotationModel): DataFrame = {
    // own projection for the cast array — dim² element_at references
    // (the Gram.secondMoment lesson)
    val doubled = vecs.select(col(idCol).as(idCol),
      transform(col(vecCol), x => x.cast("double")).as("xv"))
    val out: Column = array(model.rows.map { row =>
      val bias = row.zip(model.means).map { case (w, mu) => w * mu }.sum
      row.zipWithIndex.map { case (w, d) =>
        element_at(col("xv"), d + 1) * lit(w)
      }.reduce(_ + _) - lit(bias)
    }: _*)
    doubled.select(col(idCol), out.as("rvec"))
  }

  /** The exact-rational rotation: an integer matrix R (denominator
    * 5^steps) from `steps` composed (3,4,5) Givens rotations on
    * md5-derived coordinate pairs. Row L2 norms are EXACTLY 5^steps
    * (orthogonality is exact integer arithmetic, spec-assertable with
    * `==`). Entry bound |R_ij| ≤ 5^steps ≤ 1.6e11 at steps=16 — Long.
    */
  final case class RationalRotation(num: Array[Array[Long]], steps: Int) {
    val denom: Long = (0 until steps).foldLeft(1L)((a, _) => a * 5L)
  }

  /** The md5-derived Givens schedule — (p, q, sign) per step; exposed
    * so the SQL oracle generator embeds the SAME literals. */
  def schedule(seed: Long, dim: Int, steps: Int): Seq[(Int, Int, Int)] = {
    require(dim >= 2, s"dim must be >= 2: $dim")
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until steps).map { t =>
      val h = md.digest(s"opq:$seed:$t".getBytes("UTF-8"))
      val a = java.lang.Math.floorMod(
        java.nio.ByteBuffer.wrap(h.take(8)).getLong, dim.toLong).toInt
      val off = 1 + java.lang.Math.floorMod(
        java.nio.ByteBuffer.wrap(h.slice(8, 16)).getLong,
        (dim - 1).toLong).toInt
      val b = (a + off) % dim
      val sign = if ((h(7) & 1) == 0) 1 else -1
      (math.min(a, b), math.max(a, b), sign)
    }
  }

  /** Compose the schedule into the integer rotation matrix. Each step
    * scales untouched rows by 5 so the WHOLE matrix shares one
    * denominator; rows p/q get the exact (3, ±4) mix. */
  def rationalRotation(seed: Long, dim: Int, steps: Int)
      : RationalRotation = {
    require(steps >= 0 && steps <= 16,
      s"steps must be in [0, 16] (entry bound 5^steps must stay well " +
        s"inside BIGINT with a 1e6-grid vector dot on top): $steps")
    var r = Array.tabulate(dim, dim)((i, j) => if (i == j) 1L else 0L)
    schedule(seed, dim, steps).foreach { case (p, q, s) =>
      val next = Array.tabulate(dim, dim) { (i, j) =>
        if (i == p) 3L * r(p)(j) + s * 4L * r(q)(j)
        else if (i == q) -s * 4L * r(p)(j) + 3L * r(q)(j)
        else 5L * r(i)(j)
      }
      r = next
    }
    RationalRotation(r, steps)
  }

  /** (id, rvec): the exact rational rotation on the 10⁻⁶ grid —
    * q = round(x·1e6) BIGINT, u_i = Σ_j R_ij·q_j exact (bound
    * ‖R_i‖₂·‖q‖₂ = 5^steps·1e6·‖x‖₂ < 2⁶³ for any sane embedding),
    * then u/denom TRUNCATED TOWARD ZERO back onto the grid and /1e6
    * into a DOUBLE array. Truncation, not floor: DuckDB's `//`
    * truncates on negatives (−7//5 = −1 — measured; a floor here cost
    * ±1 on 18% of rotated comps before the oracle caught it), so the
    * Spark side uses u − (u % denom) (Spark's % carries the dividend's
    * sign — the truncation multiple) and divides the exact multiple in
    * DECIMAL. A plain long `/` would silently route through DOUBLE and
    * lose low bits past 2⁵³. The grid values are ≤ ~1e8, so the
    * standard [[PqIndex]] round(·1e6) quantization recovers the
    * integers exactly — PQ over `rvec` IS PQ over the integers the
    * oracle computes. Validation is [[PqIndex]]'s: this face feeds it
    * directly. */
  def rotateExact(vecs: DataFrame, idCol: String, vecCol: String,
      rot: RationalRotation): DataFrame = {
    // the X148 RandomProjection shape, NOT a dim² literal expression
    // chain: 64 outputs × 64 dup-referenced integer dots drove codegen's
    // subexpression elimination past a 2 GB source buffer (measured
    // OOM). Here the matrix is a 4096-row broadcast frame, the dot is
    // one partial-aggregated (id, out-dim) sum — integer, so
    // aggregation order cannot change the result — and the array
    // reassembles by sorted collect. Exchange = N·dim longs twice.
    val spark = vecs.sparkSession
    import spark.implicits._
    val rdf = broadcast(rot.num.zipWithIndex.flatMap { case (row, i) =>
      row.zipWithIndex.map { case (wgt, j) => (i, j, wgt) }
    }.toSeq.toDF("oi", "pos", "w"))
    val comps = vecs.select(col(idCol).as(idCol),
        posexplode(transform(col(vecCol),
          x => round(x.cast("double") * lit(GRID)).cast("long")))
          .as(Seq("pos", "q")))
    val u = comps.join(rdf, Seq("pos"))
      .groupBy(col(idCol), col("oi"))
      .agg(sum(col("w") * col("q")).as("u"))
    val truncated = ((col("u") - col("u") % lit(rot.denom))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0))
      / lit(rot.denom)).cast("long")
    u.select(col(idCol), col("oi"),
        (truncated.cast("double") / lit(GRID)).as("r"))
      .groupBy(col(idCol))
      .agg(transform(sort_array(collect_list(struct(col("oi"), col("r")))),
        x => x.getField("r")).as("rvec"))
  }
}
