package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round Bellman–Ford: cheapest-path costs from a seed set over
  * non-negative INTEGER edge weights — [[Bfs]]'s weighted sibling
  * (hop counts become costs: latency-weighted blast radius, cheapest
  * dependency routes, weighted proximity staging).
  *
  * `rounds` = maximum path LENGTH considered: after r rounds every node
  * carries the exact minimum cost over paths of ≤ r edges (the
  * classical Bellman–Ford invariant), so fixed rounds are not an
  * approximation knob but a well-defined semantics — and they keep the
  * operator oracle-expressible (unrolled relax-round CTEs, the
  * [[PageRank]] pattern). Non-negative integer weights make every cost
  * an exact BIGINT — no float path-sum ordering ambiguity, and a
  * replayed SQL twin hash-matches bit-for-bit.
  *
  * Relaxation is monotone set arithmetic, not mutation: round r joins
  * the current cost frame against the edge list, unions the candidate
  * (dst, cost+w) rows with the incumbents, and takes min per node —
  * one shuffle join + one partial-agg min per round. Unreached nodes
  * are absent (same contract as [[Bfs]]); seeds start at cost 0.
  *
  * Shape for 100 TB: the edge list is materialized ONCE
  * (localCheckpoint, re-joined every round — [[Components]] contract);
  * the cost frame is checkpointed per round so round r+1 reads blocks,
  * not a 2r-deep plan. Both sides of the relax join shuffle on the node
  * key — the cost frame is the SMALL side early on but converges to
  * all reached nodes, so no broadcast hint is safe in general; pass
  * `broadcastCosts=true` when the reachable set is known to be bounded
  * (e.g. ego-network queries) and the join becomes map-side.
  *
  * Emits (node BIGINT, cost BIGINT) — exact min cost over ≤ `rounds`
  * edges.
  */
object Sssp {

  def boundedCosts(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: DataFrame, seedCol: String, rounds: Int,
      undirected: Boolean = false, broadcastCosts: Boolean = false)
      : DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")

    val directed = edges.select(
      col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      col(weightCol).cast("long").as("w"))
    // one pass, not a union — AQE does not reuse sibling stages
    val oriented =
      if (!undirected) directed
      else directed.select(explode(array(
          struct(col("src"), col("dst"), col("w")),
          struct(col("dst").as("src"), col("src").as("dst"), col("w"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.w").as("w"))
    // parallel edges collapse to their cheapest — fewer candidate rows
    // per round, identical costs
    val e = oriented.where(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .localCheckpoint(false)

    var costs = seeds
      .select(col(seedCol).cast("long").as("node")).distinct()
      .withColumn("cost", lit(0L))
      .localCheckpoint(false)

    (1 to rounds).foreach { _ =>
      val probe = if (broadcastCosts) broadcast(costs) else costs
      val cand = e.join(probe, col("src") === col("node"))
        .select(col("dst").as("node"), (col("cost") + col("w")).as("cost"))
      costs = costs.union(cand)
        .groupBy(col("node")).agg(min(col("cost")).as("cost"))
        .localCheckpoint(false)
    }
    costs
  }
}
