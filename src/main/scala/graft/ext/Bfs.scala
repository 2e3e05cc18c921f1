package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances over an undirected graph, bounded
  * depth — the "how far is every node from the seed set" primitive the
  * rest of the graph family (Components, PageRank, KCore, LabelProp,
  * Triangles) doesn't cover: blast-radius queries ("everything within 3
  * hops of a failed dependency"), curriculum staging by distance from a
  * trusted core, and seed-expansion labeling.
  *
  * Frontier expansion, not closure: round d joins ONLY the depth-(d−1)
  * frontier against the edge list, dedups the neighbor set, and
  * anti-joins the already-settled nodes — each node is emitted exactly
  * once, at its first (= minimum) depth, which is what makes BFS on an
  * unweighted graph correct without any min-aggregate over path
  * multiplicities. A transitive-closure formulation (what the SQL oracle
  * replays) re-derives every (node, depth) pair reachable along ANY
  * path; the frontier formulation touches each edge at most once per
  * incident frontier round.
  *
  * Shape for 100 TB: the symmetrized edge list is materialized ONCE
  * (localCheckpoint — it is re-joined every round, and the upstream pair
  * computation must not replan per round; same contract as
  * [[Components]]). Per round: one join frontier⋈edges, one distinct,
  * one anti join against the settled set. With `broadcastFrontier`
  * (default) the frontier and settled sets ride broadcast hash joins —
  * one scalar per frontier/settled NODE, fine up to ~10⁸ nodes; beyond
  * that pass false and both joins shuffle on the node key (the 100 TB
  * path, same knob as [[KCore.survivors]]). The per-round driver
  * `isEmpty` early-exit is a limit-1 probe on the already-computed
  * frontier, not a collect.
  *
  * `maxDepth` bounds the rounds (and keeps the operator
  * oracle-expressible — the SQL twin unrolls to a depth-bounded
  * recursive closure); nodes farther than `maxDepth` from every seed are
  * absent from the output, by contract. Seeds not present in the edge
  * list still appear at dist 0 (they are settled before expansion).
  *
  * Emits (node BIGINT, dist INT), dist ∈ [0, maxDepth], one row per
  * reached node.
  */
object Bfs {

  def distances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxDepth: Int,
      broadcastFrontier: Boolean = true): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")

    val sym = Graphs.symmetrized(edges, srcCol, dstCol, "a", "b")

    def hinted(df: DataFrame): DataFrame =
      if (broadcastFrontier) broadcast(df) else df

    var frontier = seeds
      .select(col(seedCol).cast("long").as("node")).distinct()
      .withColumn("dist", lit(0))
      .localCheckpoint()
    // settled generations accumulate as a union of ALREADY-materialized
    // per-round frames — the anti join never recomputes a prior round
    var generations = List(frontier)

    var d = 1
    var done = false
    while (d <= maxDepth && !done) {
      val settled = generations.map(_.select(col("node"))).reduce(_ union _)
      val next = sym
        .join(hinted(frontier.select(col("node"))), col("a") === col("node"))
        .select(col("b").as("node"))
        .distinct()
        .join(hinted(settled), Seq("node"), "left_anti")
        .withColumn("dist", lit(d))
        .localCheckpoint()
      if (next.isEmpty) done = true
      else { generations ::= next; frontier = next }
      d += 1
    }
    generations.reduce(_ union _)
  }
}
