package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact second-moment (gram) matrix over an embedding column, and the
  * PCA that falls out of it — the dimensionality-reduction face for
  * embedding analytics (variance auditing, whitening, cheap 2-D corpus
  * maps): at 100 TB the ONLY tractable PCA is "reduce the corpus to a
  * dim×dim summary in one pass, eigendecompose the summary" — the
  * corpus is touched once for the gram and once for the projection,
  * never materialized per-component.
  *
  * [[secondMoment]] is integer-exact on the 10⁻⁶ grid ([[KMeans]]'
  * quantization): per row the upper-triangle products are expanded
  * IN-ROW (dim·(dim+1)/2 structs through whole-stage codegen — no
  * self-join, no N·dim shuffle) and partial aggregation collapses them
  * to dim² rows per partition before any exchange. Exactness bound:
  * Σ q_i·q_j over N rows must fit BIGINT — N·(10⁶·|x|)² < 2⁶³, i.e.
  * ~3·10⁷ rows at |x| ≤ 1 on the 10⁻⁶ grid; rescale the grid (or
  * pre-aggregate shards) beyond that, same contract as
  * [[TextAnalysis]]' quantized sums.
  *
  * [[fitPca]] collects the dim×dim summary (dim²
  * scalars — the [[IvfIndex]] k-bounded-collect precedent, NOT a data
  * collect) and runs a deterministic cyclic Jacobi eigensolver on the
  * driver: fixed sweep order, fixed sweep count, eigenvalue-descending
  * order with index tie-break, sign fixed so each vector's
  * largest-|component| entry is positive — the same inputs give the
  * same components on any cluster, any partitioning.
  *
  * [[project]] applies components as literal arrays: one in-row
  * dot-product chain (codegen), zero joins, zero shuffles.
  */
object Gram {

  private val GRID = 1e6

  /** (i, j, s): upper triangle (i ≤ j) of Σ over rows of q_i·q_j on the
    * 10⁻⁶ BIGINT grid, plus ("i"=-1, j, s) rows carrying Σ q_j and one
    * (-1, -1, N) row — everything covariance needs in ONE pass. */
  def secondMoment(vecs: DataFrame, vecCol: String): DataFrame = {
    // quantize in its OWN projection: the pair expression below indexes
    // qv ~dim² times, and an inlined transform would be re-evaluated at
    // every element_at (measured 199 s → 2.1 s at sf0.1 — the optimizer
    // keeps the projection because the alias is multiply-referenced and
    // non-cheap, so each row quantizes exactly once)
    val quant = graft.model.Parallelism.floor(
      vecs.select(transform(col(vecCol),
        x => round(x.cast("double") * lit(GRID)).cast("long")).as("qv")))
    val qv = col("qv")
    val d = size(qv)
    // guard d = 0: sequence(0, -1) generates DESCENDING [0, -1] and the
    // spurious i = -1 reaches element_at(qv, 0), which always throws —
    // the same pitfall [[DictTag]] guards; an empty vector contributes
    // only its count row
    val emptyTriple = array().cast("array<struct<i:int,j:int,p:bigint>>")
    // upper-triangle products + first-moment row (-1, j) + count row
    // (-1, -1), all through the same explode → ONE aggregate
    val pairs = concat(
      when(d >= 1,
        flatten(transform(sequence(lit(0), d - 1), i =>
          transform(sequence(i, d - 1), j =>
            struct(i.as("i"), j.as("j"),
              (element_at(qv, i + 1) * element_at(qv, j + 1)).as("p"))))))
        .otherwise(emptyTriple),
      when(d >= 1,
        transform(sequence(lit(0), d - 1), j =>
          struct(lit(-1).as("i"), j.as("j"), element_at(qv, j + 1).as("p"))))
        .otherwise(emptyTriple),
      array(struct(lit(-1).as("i"), lit(-1).as("j"), lit(1L).as("p"))))
    quant.select(explode(pairs).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.p")).as("s"))
  }

  /** Driver-side PCA summary: top-k covariance eigenvectors (rows =
    * components, descending eigenvalue) + the mean vector — dim·(k+1)
    * doubles, broadcast-trivial. */
  final case class PcaModel(components: Array[Array[Double]],
      means: Array[Double])

  /** The FULL eigensystem [[fitPca]] truncates: all dim components
    * (rows, descending eigenvalue), their eigenvalues, and the means —
    * what a rotation consumer ([[Opq]]) needs, since allocation
    * decisions read the SPECTRUM, not just the leading directions. */
  final case class EigModel(components: Array[Array[Double]],
      eigenvalues: Array[Double], means: Array[Double])

  /** Fit the full [[EigModel]] from one [[secondMoment]] pass. */
  def fitEig(vecs: DataFrame, vecCol: String): EigModel = {
    val rows = secondMoment(vecs, vecCol).collect()
    val n = rows.find(r => r.getInt(0) == -1 && r.getInt(1) == -1)
      .map(_.getLong(2).toDouble)
      .getOrElse(throw new IllegalArgumentException("empty input"))
    val dim = rows.iterator.map(_.getInt(1)).max + 1
    val mean = new Array[Double](dim)
    val cov = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), r.getLong(2))
      if (i == -1 && j >= 0) mean(j) = s / n / GRID
    }
    rows.foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), r.getLong(2))
      if (i >= 0) {
        val c = s / n / (GRID * GRID) - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
      }
    }
    val (vecsOut, vals) = jacobiAll(cov)
    EigModel(vecsOut, vals, mean)
  }

  /** Fit a [[PcaModel]] from one [[secondMoment]] pass. (No id column:
    * the moment sums are row-identity-agnostic by construction —
    * [[project]] is the face that needs ids.) */
  def fitPca(vecs: DataFrame, vecCol: String, k: Int): PcaModel = {
    val e = fitEig(vecs, vecCol)
    val dim = e.means.length
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]")
    PcaModel(e.components.take(k), e.means)
  }

  /** (id, pc ARRAY<DOUBLE>[k]): mean-centered projection onto the
    * model's components — each component's centering folds into ONE
    * literal bias (Σ v_d·(x_d − μ_d) = Σ v_d·x_d − Σ v_d·μ_d), so the
    * whole projection is a codegen dot-product chain: no joins, no
    * shuffles, one corpus pass. */
  def project(vecs: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame = {
    val xv = transform(col(vecCol), x => x.cast("double"))
    val pcs: Column = array(model.components.map { comp =>
      val bias = comp.zip(model.means).map { case (w, m) => w * m }.sum
      comp.zipWithIndex.map { case (w, d) =>
        element_at(xv, d + 1) * lit(w)
      }.reduce(_ + _) - lit(bias)
    }: _*)
    vecs.select(col(idCol).as("id"), pcs.as("pc"))
  }

  /** Isotropy diagnostic from the one-pass gram summary, INTEGER-EXACT
    * end-to-end — the number that decides whether a rotation (OPQ /
    * whitening) can help an embedding corpus at all: the covariance
    * participation ratio PR = (tr C)² / tr(C²) ∈ [1, dim] (= dim for a
    * perfectly isotropic spectrum, → 1 when one direction dominates;
    * the effective-rank measure, a.k.a. inverse participation ratio).
    *
    * No eigensolve and no floats: on the 10⁻⁶ grid,
    * cov_ij ∝ num_ij = Σq_i·q_j·n − Σq_i·Σq_j (the n² denominator
    * cancels inside PR), each num floor-divided by 10⁴ so squares and
    * their Σ fit DECIMAL(38,0) for any feasible (n, dim), off-diagonal
    * squares doubled (upper triangle → full trace), and PR emitted as
    * `pr_x10000 = ⌊(tr²·10⁴)/trC2⌋` — every step replays in SQL, so
    * the diagnostic hash-gates (q_embed_isotropy). Exactness bounds:
    * the num_ij products run in DECIMAL(38,0) (s·n and the moment
    * product reach n²·10¹² — Long would overflow silently from
    * n ≈ 3·10³ worst-case), so the binding constraint is
    * [[secondMoment]]'s own Σ-fits-BIGINT contract (~3·10⁷ rows at
    * |x| ≤ 1); beyond that, pre-scale the grid.
    *
    * One row out: (n, dim, pr_x10000, var_num_min, var_num_max) — the
    * variance-numerator extremes expose per-dimension imbalance at the
    * same exactness. */
  def isotropy(vecs: DataFrame, vecCol: String): DataFrame = {
    val mom = secondMoment(vecs, vecCol).localCheckpoint()
    val nRow = mom.filter(col("i") === -1 && col("j") === -1)
      .select(col("s").as("n"))
    val firsts = mom.filter(col("i") === -1 && col("j") >= 0)
      .select(col("j").as("d"), col("s").as("m"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pairs = mom.filter(col("i") >= 0)
      .join(broadcast(firsts.select(col("d").as("i"), col("m").as("mi"))),
        Seq("i"))
      .join(broadcast(firsts.select(col("d").as("j"), col("m").as("mj"))),
        Seq("j"))
      .crossJoin(broadcast(nRow))
      // DECIMAL(38,0) BEFORE the products (advice r14, low): in
      // LongType, s·n reaches n²·10¹² and mi·mj reaches (n·10⁶)² —
      // silent 2⁶³ overflow from n ≈ 3·10³ worst-case, far below the
      // documented secondMoment bound, and Spark's non-ANSI Long math
      // would corrupt the diagnostic quietly while DuckDB's BIGINT
      // errors loudly. Decimal keeps every term exact to 38 digits
      // (n ≤ ~10¹³ at grid-unit components — secondMoment's own Σ
      // bound binds first).
      .select(col("i"), col("j"),
        (col("s").cast(dec) * col("n").cast(dec) -
          col("mi").cast(dec) * col("mj").cast(dec)).as("num0"))
    // TRUNCATED division by 10⁴ — DuckDB's `//` truncates toward zero
    // on negatives (measured: −7//5 = −1), and off-diagonal numerators
    // go negative, so the Spark side must truncate too: u − (u % d) is
    // the truncation multiple (Spark % carries the dividend's sign) and
    // the decimal division of the exact multiple has no float path
    val scaled = pairs.select(col("i"), col("j"),
      ((col("num0") - col("num0") % lit(10000L))
        / lit(10000L)).cast("long").as("num"))
    val traces = scaled.agg(
      sum(when(col("i") === col("j"), col("num"))).as("tr_c"),
      sum((col("num").cast(dec) * col("num").cast(dec)) *
        when(col("i") =!= col("j"), lit(2)).otherwise(lit(1)))
        .as("tr_c2"),
      min(when(col("i") === col("j"), col("num"))).as("var_num_min"),
      max(when(col("i") === col("j"), col("num"))).as("var_num_max"),
      (max(col("j")) + 1).as("dim"))
    traces.crossJoin(broadcast(nRow))
      .select(col("n"), col("dim"),
        floor(col("tr_c").cast(dec) * col("tr_c").cast(dec) * lit(10000L)
          / col("tr_c2")).cast("long").as("pr_x10000"),
        col("var_num_min"), col("var_num_max"))
  }

  /** Cyclic Jacobi with fixed sweeps — deterministic by construction.
    * Returns (components desc by eigenvalue, eigenvalues in the same
    * order). */
  private def jacobiAll(a0: Array[Array[Double]])
      : (Array[Array[Double]], Array[Double]) = {
    val dim = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    val sweeps = 30
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < dim) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < dim) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < dim) {
        var j = i + 1
        while (j < dim) { off += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      sweep += 1
    }
    // (eigenvalue desc, index asc) total order; sign: largest-|entry|
    // component positive (ties at equal |entry| → first index wins)
    val order = (0 until dim).sortBy(i => (-a(i)(i), i))
    val comps = order.map { col =>
      val vec = Array.tabulate(dim)(r => v(r)(col))
      val m = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(m) < 0) vec.map(-_) else vec
    }.toArray
    (comps, order.map(i => a(i)(i)).toArray)
  }
}
