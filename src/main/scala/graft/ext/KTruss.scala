package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss peeling — the EDGE-level cohesion filter: keep edges whose
  * triangle support (triangles containing the edge) stays ≥ k−2 across
  * fixed peeling rounds. The sibling of [[KCore]] (vertex degree
  * peeling) one rung up the cohesion ladder: cores keep well-connected
  * VERTICES, trusses keep edges embedded in dense NEIGHBORHOODS — the
  * community-backbone / link-spam filter on the co-occurrence graph.
  *
  * Fixed `rounds` is a SEMANTICS here, not an approximation cut-off
  * (the [[KCore]]/[[Sssp]] posture): round r keeps exactly the edges
  * whose support held through r rounds of simultaneous peeling, and
  * the oracle replays the same unrolled rounds.
  *
  * Per-round shape (the [[Triangles]] discipline): degree-oriented
  * adjacency intersection — out-lists bounded O(√2m) by orientation,
  * so hubs never concentrate; support comes from ONE explode of the
  * per-edge intersection into 3 canonical edge keys per triangle
  * (3T rows, the output's own size) into a partial-aggregated count;
  * the survivor cut is a semi join on the edge key. Rounds
  * localCheckpoint so lineage stays bounded.
  */
object KTruss {

  /** @return the surviving canonical edge list (a, b) with a < b. */
  def survivors(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int, broadcastAdjacency: Boolean = true): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3 (k=2 keeps every edge): $k")
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val u = col(srcCol)
    val v = col(dstCol)
    var e = edges
      .where(u =!= v)
      .select(least(u, v).as("a"), greatest(u, v).as("b"))
      .distinct()
      .localCheckpoint()

    (1 to rounds).foreach { _ =>
      val keep = edgeSupport(e, broadcastAdjacency)
        .filter(col("support") >= k - 2)
        .select(col("a"), col("b"))
      e = e.join(keep, Seq("a", "b"), "left_semi").localCheckpoint()
    }
    e
  }

  /** Per-edge triangle support over a canonical (a < b) edge frame:
    * (a, b, support) for edges in ≥ 1 triangle. */
  def edgeSupport(canon: DataFrame,
      broadcastAdjacency: Boolean = true): DataFrame = {
    def maybeBroadcast(df: DataFrame) =
      if (broadcastAdjacency) broadcast(df) else df
    val deg = canon.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val degA = deg.toDF("a", "da")
    val degB = deg.toDF("b", "db")
    val withDeg = canon.join(maybeBroadcast(degA), "a")
      .join(maybeBroadcast(degB), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint() // feeds the adjacency agg AND the edge probe
    // same size contract as Triangles.broadcastAdjacency: the payload
    // is the whole oriented edge list — pass false past ~10^8 edges and
    // both probes become shuffle joins with orientation-bounded rows
    val adj = maybeBroadcast(oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("outs")))
    // each triangle {u,v,w} appears once (at its lowest oriented edge);
    // explode it into its THREE canonical edge keys — 3T rows total
    oriented
      .join(adj.select(col("src"), col("outs").as("ou")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("outs").as("ov")), Seq("dst"))
      .select(col("src").as("u"), col("dst").as("v"),
        explode(array_intersect(col("ou"), col("ov"))).as("w"))
      .select(explode(array(
        struct(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b")),
        struct(least(col("u"), col("w")).as("a"),
          greatest(col("u"), col("w")).as("b")),
        struct(least(col("v"), col("w")).as("a"),
          greatest(col("v"), col("w")).as("b")))).as("edge"))
      .select(col("edge.a").as("a"), col("edge.b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("support"))
  }
}
