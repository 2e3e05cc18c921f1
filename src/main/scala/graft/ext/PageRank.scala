package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in INTEGER arithmetic — deterministic across
  * engines and runs: scores are scaled to a 10¹² integer grid and every
  * step is BIGINT floor division (`div`), so there is no floating-point
  * accumulation order to disagree about and the result is bit-exact
  * against a SQL oracle (a float PageRank never is).
  *
  * score₀(v) = S (= 10¹²);  per iteration:
  *   score(v) = ⌊S·(1−d)·100⌋/(100·N) + ⌊d·100 · Σ_{u→v}⌊score(u)/out(u)⌋⌋/100
  * with d = 85/100. Dangling-node mass is dropped (the usual batch
  * simplification — documented, matched by the oracle).
  *
  * [[personalized]] is the topic-sensitive variant: the teleport mass
  * concentrates on a SOURCE set instead of spreading uniformly —
  * base_v = ⌊S·(1−d)·100⌋/(100·|sources|) for source nodes, 0 elsewhere,
  * and score₀ is S on sources, 0 elsewhere. Proximity-to-seed ranking
  * (related-entity discovery, seed-expansion curation) under the same
  * integer-exact contract.
  *
  * The edge/node/out-degree frames are localCheckpoint'ed once up front:
  * each unrolled iteration references them again, and without
  * materialization the edge-construction subtree would be re-executed per
  * iteration per reference (AQE does not reuse sibling stages — PERF.md).
  * Iterations are UNROLLED into one logical plan — no per-iteration
  * driver action, one job at execution.
  *
  * Overflow posture at scale: the per-node message m = Σ_{u→v}
  * ⌊score(u)/out(u)⌋ is bounded only by in-degree · scale, so a hub with
  * ~10⁷ max-score in-neighbors would exceed BIGINT. The sum and the
  * damping product are therefore computed in DECIMAL(38,0) — exact to
  * 10³⁸ — and the cast back to BIGINT is GUARDED: a score that no longer
  * fits 2⁶³ raises (`raise_error`) instead of wrapping silently. This
  * mirrors the oracle, where DuckDB sums in HUGEINT and its
  * `CAST(... AS BIGINT)` raises on overflow.
  */
object PageRank {
  val Scale: Long = 1000000000000L // 10^12 integer score grid

  /** Uniform-teleport PageRank; see object doc for the exact recurrence. */
  def scores(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, dampNum: Long = 85L,
      scale: Long = Scale): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= 100 && scale >= 1)
    val (e, nodes, n) = prepare(edges, srcCol, dstCol)
    if (n == 0) return nodes.withColumn("score", lit(scale)) // empty graph
    // BigInt: scale*(100-damp) wraps driver-side Long for scale near 2^63;
    // the quotient itself is always <= scale, so the narrowing is safe
    val base = (BigInt(scale) * (100L - dampNum) / (BigInt(100L) * n)).toLong
    iterate(e, nodes, lit(scale), lit(base), base, iterations, dampNum)
  }

  /** WEIGHTED PageRank: contributions proportional to integer edge
    * weights — score flows as ⌊score·w_uv / W_u⌋ with W_u = Σ out-
    * weights (parallel (src,dst) edges pre-collapsed by SUM; w ≤ 0
    * dropped). The affinity/interaction-count authority ranking the
    * uniform variant cannot express. Same integer-exact contract:
    * score·w is computed in DECIMAL(38,0) (exact to 10³⁸), and the
    * quotient ALWAYS fits BIGINT because w ≤ W_u ⇒ part ≤ score.
    * EVERY sum here is guarded: the per-(src,dst) weight collapse and
    * the out-weight total W_u run in DECIMAL(38,0) and narrow to
    * BIGINT under an explicit bound ([[guardedNarrow]]) — a plain
    * BIGINT sum would wrap silently in non-ANSI Spark while the
    * DuckDB oracle's HUGEINT→BIGINT cast raises (silent divergence);
    * the in-degree message sum keeps the uniform path's guard. */
  def weightedScores(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int = 3, dampNum: Long = 85L,
      scale: Long = Scale): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= 100 && scale >= 1)
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(wCol).cast("long").as("w"))
      .filter(col("w") > 0)
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("w").cast("decimal(38,0)")).as("wsum"))
      .select(col("src"), col("dst"),
        guardedNarrow(col("wsum"), "summed (src,dst) edge weight").as("w"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("score", lit(scale))
    val base = (BigInt(scale) * (100L - dampNum) / (BigInt(100L) * n)).toLong
    iterate(e, nodes, lit(scale), lit(base), base, iterations, dampNum,
      outAgg = e.groupBy(col("src"))
        .agg(sum(col("w").cast("decimal(38,0)")).as("wdsum"))
        .select(col("src"),
          guardedNarrow(col("wdsum"), "out-weight total").as("wd"))
        .localCheckpoint(),
      partExpr = "CAST(score AS DECIMAL(38,0)) * w div wd")
  }

  /** Narrow a non-negative DECIMAL(38,0) sum to BIGINT, raising loudly
    * past 2^63−1 instead of letting Decimal.toLong wrap (measured: it
    * wraps in non-ANSI mode — the same hole `iterate`'s message-sum
    * guard closes). */
  private def guardedNarrow(c: Column, what: String): Column =
    when(coalesce(c <= lit(Long.MaxValue), lit(false)), c.cast("long"))
      .otherwise(expr(
        s"raise_error('PageRank $what overflowed BIGINT (>= 2^63); " +
          "rescale the weight column before ranking')").cast("long"))

  /** Personalized (topic-sensitive) PageRank: teleport only to `sources`.
    * Scores rank every node by proximity to the seed set; nodes unreached
    * within `iterations` hops score 0. */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
      sources: Seq[Long], iterations: Int = 3, dampNum: Long = 85L,
      scale: Long = Scale): DataFrame = {
    require(sources.nonEmpty, "personalized PageRank needs a seed set")
    require(iterations >= 1 && dampNum >= 0 && dampNum <= 100 && scale >= 1)
    val (e, nodes, n) = prepare(edges, srcCol, dstCol)
    if (n == 0) return nodes.withColumn("score", lit(scale))
    val isSrc = col("id").isin(sources.map(Long.box): _*)
    val base =
      (BigInt(scale) * (100L - dampNum) / (BigInt(100L) * sources.size)).toLong
    iterate(e, nodes,
      when(isSrc, lit(scale)).otherwise(lit(0L)),
      when(isSrc, lit(base)).otherwise(lit(0L)),
      base, iterations, dampNum)
  }

  /** Canonical (src, dst) edges + node table, both materialized once. */
  private def prepare(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame, Long) = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    (e, nodes, nodes.count()) // node count: fixed constant, computed once
  }

  /** The unrolled integer power iteration; `initScore`/`baseScore` are
    * per-node expressions over the node table's `id` column, `maxBase`
    * their driver-side maximum (for the overflow bound). */
  private def iterate(e: DataFrame, nodes: DataFrame, initScore: Column,
      baseScore: Column, maxBase: Long, iterations: Int, dampNum: Long,
      outAgg: DataFrame = null, partExpr: String = "score div od"): DataFrame = {
    val outd = Option(outAgg).getOrElse(
      e.groupBy(col("src")).agg(count(lit(1)).as("od")).localCheckpoint())
    var s = nodes.withColumn("score", initScore)
    (1 to iterations).foreach { _ =>
      val contrib = e
        .join(s, e("src") === s("id"))
        .join(outd, "src")
        .select(col("dst").as("id"), expr(partExpr).as("part"))
        // DECIMAL(38,0) sum: exact for any realistic in-degree; a BIGINT
        // sum would wrap silently past 2^63 (non-ANSI mode)
        .groupBy(col("id"))
        .agg(sum(col("part").cast("decimal(38,0)")).as("m"))
      // decimal multiply keeps scale 0 (no precision loss below 10^38),
      // but decimal `div` WRAPS on BIGINT quotient overflow (measured:
      // Decimal.toLong wraps in non-ANSI mode) — so the bound is checked
      // on the DECIMAL value BEFORE dividing. A NULL damped product
      // (decimal overflow past 10^38) coalesces to unsafe and raises too.
      val dampM = expr(s"$dampNum * coalesce(m, CAST(0 AS DECIMAL(38,0)))")
      // safe ⟺ base + (dampM div 100) fits 2^63−1 for every possible base
      val limit = (BigInt(Long.MaxValue) - maxBase) * 100
      val safe = coalesce(
        dampM <= expr(s"CAST('$limit' AS DECIMAL(38,0))"), lit(false))
      s = nodes.join(contrib, Seq("id"), "left_outer")
        .select(col("id"),
          when(safe, baseScore + expr(
            s"$dampNum * coalesce(m, CAST(0 AS DECIMAL(38,0))) div 100"))
            .otherwise(expr("raise_error('PageRank score overflowed " +
              "BIGINT: in-degree * scale * damp exceeds 2^63; lower the " +
              "scale grid or partition the graph')").cast("long"))
            .as("score"))
    }
    s
  }
}
