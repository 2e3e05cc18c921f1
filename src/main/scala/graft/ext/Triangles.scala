package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the local-clustering signal for the
  * knowledge-graph side (community density, link-spam detection).
  *
  * Algorithm: the classic degree-oriented wedge join. Undirected edges
  * are canonicalized (a < b, self-loops dropped, duplicates collapsed),
  * then every edge is oriented from its lower to its higher endpoint
  * under the total order (degree, id). Each triangle {u,v,w} with
  * u ≺ v ≺ w is generated exactly once as the wedge (u→v, u→w) closed by
  * the oriented edge (v→w) — a self-join on the wedge apex plus one
  * semi-style equi join, three shuffles total.
  *
  * Why orientation matters at 100 TB: wedge count under (degree, id)
  * orientation is Σ C(outdeg, 2) = O(m^1.5) — a hub with degree 10⁶
  * contributes NO wedges from its own adjacency (every neighbor of
  * lower degree points AT it, not from it), so the join never explodes
  * on hot vertices; the naive id-ordered formulation is Θ(Σ deg²) and
  * dies on the first celebrity node. The oracle can use the naive
  * id-ordered SQL because both enumerate the same triangle set.
  *
  * Emits (node, n_tri) for every node in at least one triangle.
  */
object Triangles {

  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val u = col(srcCol)
    val v = col(dstCol)
    // canon and oriented each feed several joins below — materialize once
    // (AQE does not reuse sibling stages, so without the checkpoint the
    // upstream edge construction would re-run per consumer); both frames
    // are two/three fixed-width columns per edge, cheap at any scale
    val canon = edges
      .where(u =!= v)
      .select(least(u, v).as("a"), greatest(u, v).as("b"))
      .distinct()
      .localCheckpoint()

    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

    // orient each edge from the (deg, id)-smaller endpoint; carry the
    // destination's rank so wedges can order their two legs
    val withDeg = canon
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddeg"))
      .localCheckpoint()

    val o1 = oriented.select(col("src"), col("dst").as("v"), col("ddeg").as("dv"))
    val o2 = oriented.select(col("src"), col("dst").as("w"), col("ddeg").as("dw"))
    val wedges = o1.join(o2, Seq("src"))
      .where(col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("src").as("x"), col("v"), col("w"))
    val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
    val tri = wedges.join(closing, Seq("v", "w"))

    tri.select(explode(array(col("x"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }
}
