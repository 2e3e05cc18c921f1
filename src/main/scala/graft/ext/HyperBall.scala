package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperBall — approximate per-node neighborhood sizes |B(v, r)| via
  * HyperLogLog registers propagated along edges (Boldi & Vigna's
  * centrality algorithm, the scale path where exact ball counting is
  * Σ_v |B(v,r)| pairs of state). Radius-r ball sizes give the
  * neighborhood function and, per node, closeness/harmonic centrality
  * — the "how reachable is this node" profile that exact BFS-from-
  * every-node cannot afford at 100 TB.
  *
  * Register layout is the design decision: each node's m = 2^p HLL
  * registers are M SEPARATE INT COLUMNS, not an array — the per-round
  * neighbor merge is then `max(r_i)` × m inside ONE hash aggregate:
  * whole-stage codegen, partial aggregation (a hub's million incoming
  * register sets collapse map-side), no custom aggregate, no explode,
  * no collect_list skew. Per round: one edges⋈registers join + that
  * aggregate, localCheckpoint'ed so lineage stays bounded.
  *
  * Determinism: the only "randomness" is xxhash64(node) (seed 42);
  * register indices, ranks, merges, and the final estimate are pure
  * functions of the graph — same input, same estimate, every run. The
  * per-node estimate is quantized half-up to BIGINT before any
  * cross-node sum, so no float accumulation order exists anywhere.
  *
  * Estimator: standard HLL — α_m·m²/Σ2^(−M_j), small-range corrected
  * to m·ln(m/V) when the raw estimate ≤ 2.5m and V>0 zero registers
  * remain (balls ARE small sets at small radii, so the correction is
  * the common path; σ ≈ 1.04/√m ≈ 9% at the default p=7).
  */
object HyperBall {

  /** Per-node estimated ball size after `radius` rounds.
    * @param edges undirected pair list (one row per unordered pair is
    *              fine — symmetrized + deduped + self-loop-dropped
    *              internally via [[Graphs.symmetrized]])
    * @return (node, est) with est = half-up BIGINT estimate of
    *         |B(node, radius)| (self included). */
  def estimateBalls(edges: DataFrame, srcCol: String, dstCol: String,
                    radius: Int, p: Int = 7): DataFrame = {
    require(radius >= 1, s"radius must be >= 1: $radius")
    val e = Graphs.symmetrized(edges, srcCol, dstCol)
    var regs = init(e, p)
    // materialize every round EXCEPT the last: intermediate rounds are
    // re-joined (bounded lineage matters); the final merge is consumed
    // once, and leaving it live keeps the aggregate shape visible to
    // the caller's plan (PlanContractSpec pins the partial max there)
    for (r <- 1 to radius)
      regs = step(e, regs, p, materialize = r < radius)
    regs.select(col("node"), estimate(p).as("est"))
  }

  /** The neighborhood function: Σ_v est|B(v, r)| for r = 1..maxRadius,
    * one row per radius — each round's registers are estimated and
    * quantized per node, then summed in BIGINT. */
  def neighborhood(edges: DataFrame, srcCol: String, dstCol: String,
                   maxRadius: Int, p: Int = 7): DataFrame =
    neighborhoodOnSymmetrized(Graphs.symmetrized(edges, srcCol, dstCol),
      maxRadius, p)

  /** [[neighborhood]] on an ALREADY-symmetrized (src, dst) edge frame —
    * for callers that also need the edge set themselves (exact twins,
    * sibling sketches) and must not pay the explode+distinct twice. */
  def neighborhoodOnSymmetrized(e: DataFrame, maxRadius: Int,
                                p: Int = 7): DataFrame = {
    require(maxRadius >= 1, s"maxRadius must be >= 1: $maxRadius")
    var regs = init(e, p)
    var out: DataFrame = null
    for (r <- 1 to maxRadius) {
      // intermediate rounds feed BOTH their estimate row and the next
      // round — materialize those; the last feeds one estimate only
      regs = step(e, regs, p, materialize = r < maxRadius)
      // coalesce: an EMPTY graph (no usable edges) sums to NULL, which
      // downstream getLong calls would NPE on — 0 is the true value
      val row = regs.select(estimate(p).as("est"))
        .agg(coalesce(sum(col("est")), lit(0L)).as("est_sum"))
        .select(lit(r).as("radius"), col("est_sum"))
      out = if (out == null) row else out.union(row)
    }
    out
  }

  /** Per-node approximate HARMONIC centrality: Σ_r (|B(v,r)| −
    * |B(v,r−1)|)/r for r = 1..maxRadius — the distance-weighted
    * reachability score HyperBall was built for (Boldi & Vigna), with
    * each ball-size delta read off the same register propagation. The
    * per-radius estimates are the half-up BIGINT ball sizes, so the
    * only float step is the final fixed-order Σ delta/r — emitted in
    * micro-units as BIGINT, order-pinned by the literal unrolling.
    * Negative deltas (two estimates of a monotone quantity wobbling
    * against each other within sketch error) clamp to zero rather than
    * subtracting phantom centrality. */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
      maxRadius: Int, p: Int = 7): DataFrame =
    harmonicOnSymmetrized(Graphs.symmetrized(edges, srcCol, dstCol),
      maxRadius, p)

  /** [[harmonicCentrality]] on an already-symmetrized edge frame (see
    * [[neighborhoodOnSymmetrized]]). */
  def harmonicOnSymmetrized(e: DataFrame, maxRadius: Int,
                            p: Int = 7): DataFrame = {
    require(maxRadius >= 1, s"maxRadius must be >= 1: $maxRadius")
    var regs = init(e, p)
    var est: DataFrame = regs.select(col("node"), estimate(p).as("b0"))
    for (r <- 1 to maxRadius) {
      regs = step(e, regs, p, materialize = r < maxRadius)
      est = est.join(regs.select(col("node"), estimate(p).as(s"b$r")),
        "node")
    }
    // fixed-order literal sum of clamped deltas — no aggregate, so no
    // accumulation-order freedom to drift across runs
    val harmonic = (1 to maxRadius).map { r =>
      greatest(col(s"b$r") - col(s"b${r - 1}"), lit(0L)).cast("double") / r
    }.reduce(_ + _)
    est.select(col("node"),
      floor(harmonic * lit(1000000.0) + lit(0.5)).cast("long")
        .as("harmonic_micro"))
  }

  /** Effective diameter: the smallest radius r whose estimated
    * neighborhood function reaches `fraction` of the radius-`maxRadius`
    * value — the "how many hops reach 90% of reachable pairs" corpus
    * statistic (with HLL balls the only way to ask it at 100 TB).
    * Returns ONE row (eff_diameter, nf_at, nf_max); the per-radius
    * frame is maxRadius rows, so the driver-side pick is bounded by
    * construction. */
  def effectiveDiameter(edges: DataFrame, srcCol: String, dstCol: String,
      maxRadius: Int, fraction: Double = 0.9, p: Int = 7): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction in (0,1]: $fraction")
    val spark = edges.sparkSession
    import spark.implicits._
    val nf = neighborhood(edges, srcCol, dstCol, maxRadius, p)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val nfMax = nf.last._2
    val (r, at) = nf.find(_._2 >= fraction * nfMax).getOrElse(nf.last)
    Seq((r, at, nfMax)).toDF("eff_diameter", "nf_at", "nf_max")
  }

  // ── internals ──────────────────────────────────────────────────────

  private def m(p: Int) = 1 << p

  private def rCols(p: Int): Seq[String] = (0 until m(p)).map(i => s"r$i")

  /** α_m for the raw HLL estimator (Flajolet et al. constants). */
  private def alpha(p: Int): Double = m(p) match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case mm => 0.7213 / (1.0 + 1.079 / mm)
  }

  /** One register set per node: index = low p hash bits, rank = leading-
    * zero count of the remaining 64−p bits + 1 (`bin()` has no leading
    * zeros, so rank = (64−p) − length(bin(h2)) + 1; h2 = 0 caps it). */
  private def init(e: DataFrame, p: Int): DataFrame = {
    val h = xxhash64(col("node"), lit(42))
    val h2 = shiftrightunsigned(h, p)
    val j = pmod(h, lit(m(p))).cast("int")
    val rho = when(h2 === 0, lit(64 - p + 1))
      .otherwise(lit(64 - p + 1) - length(bin(h2)))
    val nodes = e.select(col("src").as("node")).distinct()
    nodes.select(col("node") +: (0 until m(p)).map(i =>
      when(j === i, rho).otherwise(lit(0)).cast("int").as(s"r$i")): _*)
      .localCheckpoint()
  }

  /** regs ∪ neighbor copies → per-node elementwise max, one join + one
    * codegen hash aggregate. */
  private def step(e: DataFrame, regs: DataFrame, p: Int,
                   materialize: Boolean): DataFrame = {
    val msgs = e.join(regs, e("src") === regs("node"))
      .select(col("dst").as("node") +: rCols(p).map(col): _*)
    val merged = msgs.union(regs)
      .groupBy(col("node"))
      .agg(max(col(rCols(p).head)).as(rCols(p).head),
        rCols(p).tail.map(c => max(col(c)).as(c)): _*)
    if (materialize) merged.localCheckpoint() else merged
  }

  /** In-row HLL estimate over the m register columns, half-up BIGINT. */
  private def estimate(p: Int): Column = {
    val mm = m(p)
    val arr = array(rCols(p).map(col): _*)
    val powSum = aggregate(arr, lit(0.0),
      (acc, x) => acc + pow(lit(2.0), -x.cast("double")))
    val zeros = size(filter(arr, _ === 0))
    val raw = lit(alpha(p) * mm * mm) / powSum
    val est = when(raw <= lit(2.5 * mm) && zeros > 0,
      lit(mm.toDouble) * log(lit(mm).cast("double") / zeros))
      .otherwise(raw)
    floor(est + lit(0.5)).cast("long")
  }
}
