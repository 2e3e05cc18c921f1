package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A9/G3 — per-node degree profile. The reference fuses four Gremlin
  * traversals into one `project()` per service
  * (`lambda/etl_deepflow/neptune_etl_deepflow.py:536-568`, one request per
  * node); here it is two aggregations over the edge table plus one join —
  * O(edges) total, not O(nodes) requests:
  *
  *   out_degree, in_degree, label-filtered out-degrees (e.g. calls to
  *   datastores), and `is_entry_point = (in_degree == 0)`
  *   (`etl_deepflow:603-612`).
  */
object DegreeMetrics {
  /** @param filteredOut extra out-degree columns: name → predicate over the
    *                    edge row (e.g. only edges to RDS-labeled targets). */
  def apply(
      nodes: DataFrame,
      nodeKey: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      filteredOut: Seq[(String, Column)] = Nil
  ): DataFrame = {
    val outAggs = count(lit(1)).as("out_degree") +:
      filteredOut.map { case (name, pred) => count(when(pred, 1)).as(name) }
    val out = edges.groupBy(col(srcCol).as(nodeKey)).agg(outAggs.head, outAggs.tail: _*)
    val in  = edges.groupBy(col(dstCol).as(nodeKey)).agg(count(lit(1)).as("in_degree"))

    val filled = (("out_degree", 0L) +: ("in_degree", 0L) +:
      filteredOut.map { case (n, _) => (n, 0L) }).toMap

    nodes
      .join(out, Seq(nodeKey), "left_outer")
      .join(in, Seq(nodeKey), "left_outer")
      .na.fill(filled)
      .withColumn("is_entry_point", col("in_degree") === 0L)
  }
}
