package graft.ext

import org.apache.spark.sql.DataFrame
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
  * The edge/node/out-degree frames are localCheckpoint'ed once up front:
  * each unrolled iteration references them again, and without
  * materialization the lineitem-scan subtree would be re-executed per
  * iteration per reference (AQE does not reuse sibling stages — PERF.md).
  * Iterations are UNROLLED into one logical plan — no per-iteration
  * driver action, one job at execution.
  */
object PageRank {
  val Scale: Long = 1000000000000L // 10^12 integer score grid

  def scores(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, dampNum: Long = 85L): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= 100)
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val outd = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint()
    val n = nodes.count() // fixed constant of the graph, computed once
    if (n == 0) return nodes.withColumn("score", lit(Scale)) // empty graph
    val base = (Scale * (100L - dampNum)) / (100L * n)

    var s = nodes.withColumn("score", lit(Scale))
    (1 to iterations).foreach { _ =>
      val contrib = e
        .join(s, e("src") === s("id"))
        .join(outd, "src")
        .select(col("dst").as("id"), expr("score div od").as("part"))
        .groupBy(col("id")).agg(sum(col("part")).as("m"))
      s = nodes.join(contrib, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(base) +
            expr(s"$dampNum * coalesce(m, CAST(0 AS BIGINT)) div 100"))
            .as("score"))
    }
    s
  }
}
