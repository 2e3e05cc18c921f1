package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{AntiJoinGC, DegreeMetrics, MergeUpsert}

/** The engine's persistent data model (SURVEY.md §1): a labeled property
  * graph encoded relationally —
  *
  *   vertices(label, name, props…, last_updated)   identity = (label, name)
  *   edges(src_label, src_name, edge_label, dst_label, dst_name, props…,
  *         last_seen)                               identity = (src, label, dst)
  *
  * Every reference traversal (G1–G6, SURVEY.md §2.9) is key-lookup or
  * 1–2-hop shaped, so plain joins against these two tables cover the whole
  * Gremlin surface; no Pregel/GraphFrames needed. At 100 TB both tables are
  * partitioned by `label` (vertices) / `edge_label` (edges) so label scans
  * prune partitions, and bucketed by name for shuffle-free key joins.
  */
object GraphStore {
  val VertexKey: Seq[String] = Seq("label", "name")
  val EdgeKey: Seq[String]   = Seq("src_label", "src_name", "edge_label",
    "dst_label", "dst_name")

  /** G1 — point lookup `g.V().has(label,'name',n)` → key-equality filter
    * (partition-pruned + pushed to the scan). */
  def pointLookup(vertices: DataFrame, label: String, name: String): DataFrame =
    vertices.filter(col("label") === label && col("name") === name)

  /** G2 — label scan + projection `hasLabel(L).project(...)`. */
  def labelScan(vertices: DataFrame, label: String, cols: String*): DataFrame =
    vertices.filter(col("label") === label)
      .select(cols.map(col): _*)

  /** G3/A9 — degree metrics for one vertex label over the edge table. */
  def degrees(vertices: DataFrame, edges: DataFrame, label: String,
      filteredOut: Seq[(String, Column)] = Nil): DataFrame = {
    val nodes = labelScan(vertices, label, "name").withColumnRenamed("name", "node_id")
    val labelEdges = edges.filter(col("src_label") === label ||
      col("dst_label") === label)
    DegreeMetrics(nodes, "node_id",
      labelEdges.select(col("src_name").as("src"), col("dst_name").as("dst"),
        col("edge_label"), col("dst_label")),
      "src", "dst", filteredOut)
  }

  /** G4/K1 — vertex batch merge (get-or-create + last-wins props).
    * `mapCols` carries dynamic properties (tags/env-vars/K8s labels) as
    * `map<string,string>` columns merged per key — see MergeUpsert. */
  def mergeVertices(vertices: DataFrame, batch: DataFrame,
      singleCols: Seq[String], setCols: Seq[String] = Nil,
      mapCols: Seq[String] = Nil): DataFrame =
    MergeUpsert(vertices, batch, VertexKey, singleCols, setCols, mapCols)

  /** K4/K5 — edge batch merge on the (src, label, dst) identity. */
  def mergeEdges(edges: DataFrame, batch: DataFrame,
      metricCols: Seq[String]): DataFrame =
    MergeUpsert(edges, batch, EdgeKey, metricCols)

  /** G5 — 2-hop expansion (e.g. EC2→Subnet→AZ, etl_aws:1474-1476): two
    * self-joins over the edge table. */
  def twoHop(edges: DataFrame, firstLabel: String, secondLabel: String): DataFrame =
    twoHop(edges, edges, firstLabel, secondLabel)

  /** G5 two-hop with pre-separated legs. Callers that anchor the
    * traversal on a few source vertices should pre-filter `first` (on
    * the RAW key so the predicate reaches the scan) and wrap it in
    * `broadcast(...)` — the anchor leg is then map-side joined against
    * the second leg with no shuffle of the big edge table. */
  def twoHop(first: DataFrame, second: DataFrame,
      firstLabel: String, secondLabel: String): DataFrame = {
    val e1 = first.filter(col("edge_label") === firstLabel)
      .select(col("src_label").as("a_label"), col("src_name").as("a_name"),
        col("dst_label").as("m_label"), col("dst_name").as("m_name"))
    val e2 = second.filter(col("edge_label") === secondLabel)
      .select(col("src_label").as("m_label"), col("src_name").as("m_name"),
        col("dst_label").as("c_label"), col("dst_name").as("c_name"))
    e1.join(e2, Seq("m_label", "m_name"))
      .select(col("a_label"), col("a_name"), col("m_label"), col("m_name"),
        col("c_label"), col("c_name"))
  }

  /** G6/K10 — filtered bulk delete. The dropped-row count rides the SAME
    * job as the retained result via `observe` (pass an `Observation` and
    * read `dropped` after your action) — no separate count pass over the
    * store per purge. */
  def purge(vertices: DataFrame, victim: Column,
      stats: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val base = stats match {
      case Some(o) =>
        vertices.observe(o, count(when(victim, lit(1))).as("dropped"))
      case None => vertices
    }
    base.filter(!victim)
  }

  /** A14/K9 — ghost-vertex GC against a live snapshot, per label. */
  def gc(vertices: DataFrame, live: DataFrame): DataFrame =
    AntiJoinGC.retained(vertices, live, VertexKey)

  /** Referential hygiene: drop edges whose endpoints left the vertex set
    * (the reference never needs this because Neptune cascades; a relational
    * encoding must do it explicitly after GC). */
  def pruneDanglingEdges(edges: DataFrame, vertices: DataFrame): DataFrame = {
    val keys = vertices.select(col("label"), col("name"))
    edges
      .join(keys.select(col("label").as("src_label"), col("name").as("src_name")),
        Seq("src_label", "src_name"), "left_semi")
      .join(keys.select(col("label").as("dst_label"), col("name").as("dst_name")),
        Seq("dst_label", "dst_name"), "left_semi")
  }
}
