package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step between
  * near-dup PAIRS and dedup CLUSTERS: transitive closure groups the pairs
  * so one representative per component survives (a pair list alone can
  * drop both docs of a chain A–B–C, or keep two of them).
  *
  * Min-label propagation: every node starts labeled with itself; each
  * round every node takes the minimum label among itself and its
  * neighbors; fixpoint = components labeled by their minimum member.
  * Each round is ONE distributed aggregation (union of current labels
  * with neighbor-forwarded labels, `min` per node) — no driver-side graph
  * state, and the per-round `localCheckpoint` keeps the plan flat instead
  * of growing a 2^rounds lineage; each round's checkpoint blocks are
  * unpersisted as soon as the next round materializes, so executor
  * storage holds at most two generations. Convergence is detected
  * distributedly (count of changed labels); rounds needed = component
  * diameter, which for near-dup clusters is tiny (chains of a few docs).
  * For planetary-diameter graphs swap in the large-star/small-star
  * contraction (same per-round shape, O(log n) rounds) — out of scope
  * here by design.
  *
  * Hitting `maxIter` without convergence THROWS by default: unconverged
  * labels are silently-wrong cluster assignments (a long chain splits in
  * two). Pass `strict = false` to get best-effort labels instead (logged).
  */
object Components {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.ext.Components")

  /** The checkpoint blocks backing a localCheckpoint'd frame. */
  private def checkpointRdd(df: DataFrame) =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** @return (node, component) — component = min node id reachable. */
  def connected(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25, strict: Boolean = true): DataFrame = {
    // symmetrize in ONE pass over the edge subtree (explode, not union —
    // a union would evaluate an expensive upstream pair computation twice,
    // since AQE does not reuse sibling stages), then materialize once:
    // edges are re-joined every round
    val sym = edges
      .select(explode(array(
        struct(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b")),
        struct(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b"))))
        .as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("a").as("node"))
      .distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val msgMin = sym
        .join(labels, sym("a") === labels("node"))
        .select(col("b").as("node"), col("component"))
        .groupBy(col("node")).agg(min(col("component")).as("m"))
      // min(self, neighbors) via ONE left join; the change flag rides the
      // SAME checkpointed frame, so convergence detection is a scan of
      // the materialized blocks (limit-1 early exit), not a second
      // shuffle join against the previous round
      val next = labels
        .join(msgMin, Seq("node"), "left_outer")
        .select(col("node"),
          least(col("component"), coalesce(col("m"), col("component")))
            .as("component"),
          (coalesce(col("m"), col("component")) < col("component"))
            .as("__chg"))
        .localCheckpoint()
      val anyChanged = next.filter(col("__chg")).limit(1).count() > 0
      checkpointRdd(labels).foreach(_.unpersist(false)) // free prior round
      labels = next.drop("__chg")
      converged = !anyChanged
      round += 1
    }
    checkpointRdd(sym).foreach(_.unpersist(false))
    if (!converged) {
      val msg = s"connected components did not converge within $maxIter " +
        "rounds (graph diameter exceeds the budget) — labels are NOT final"
      if (strict) throw new IllegalStateException(msg)
      else log.warn(msg)
    }
    labels
  }
}
