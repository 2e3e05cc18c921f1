package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphStoreSpec extends SparkSpec {
  import spark.implicits._

  private val vertices = Seq(
    ("Microservice", "payment", "healthy", 1L),
    ("Microservice", "search", "healthy", 1L),
    ("RDSCluster", "maindb", "healthy", 1L),
    ("AvailabilityZone", "az-1", "healthy", 1L)
  ).toDF("label", "name", "health_status", "last_updated")

  private val edges = Seq(
    ("Microservice", "payment", "Calls", "Microservice", "search", 5L),
    ("Microservice", "payment", "Calls", "RDSCluster", "maindb", 2L),
    ("Microservice", "search", "LocatedIn", "AvailabilityZone", "az-1", 0L)
  ).toDF("src_label", "src_name", "edge_label", "dst_label", "dst_name", "calls")

  test("G1 point lookup / G2 label scan") {
    assert(GraphStore.pointLookup(vertices, "Microservice", "search").count() == 1)
    assert(GraphStore.labelScan(vertices, "Microservice", "name")
      .as[String].collect().toSet == Set("payment", "search"))
  }

  test("G3 degrees with label-filtered out-count and entry-point flag") {
    val d = GraphStore.degrees(vertices, edges, "Microservice",
      Seq("rds_out" -> (col("dst_label") === "RDSCluster")))
      .collect().map(r => r.getAs[String]("node_id") -> r).toMap
    assert(d("payment").getAs[Long]("out_degree") == 2)
    assert(d("payment").getAs[Long]("rds_out") == 1)
    assert(d("payment").getAs[Boolean]("is_entry_point"))
    assert(d("search").getAs[Long]("in_degree") == 1)
    assert(!d("search").getAs[Boolean]("is_entry_point"))
  }

  test("G5 two-hop expansion: service → service → AZ") {
    val hops = GraphStore.twoHop(edges, "Calls", "LocatedIn").collect()
    assert(hops.length == 1)
    assert(hops.head.getAs[String]("a_name") == "payment")
    assert(hops.head.getAs[String]("c_name") == "az-1")
  }

  test("merge + gc + dangling-edge prune keep the store consistent") {
    val batch = Seq(("Microservice", "newsvc", "healthy", 2L))
      .toDF("label", "name", "health_status", "last_updated")
    val merged = GraphStore.mergeVertices(vertices, batch,
      singleCols = Seq("health_status", "last_updated"))
    assert(merged.count() == 5)

    // live snapshot no longer contains "search"
    val live = merged.filter($"name" =!= "search").select("label", "name")
    val afterGc = GraphStore.gc(merged, live)
    assert(afterGc.count() == 4)

    val prunedEdges = GraphStore.pruneDanglingEdges(edges, afterGc)
    // both edges touching "search" disappear
    assert(prunedEdges.count() == 1)
    assert(prunedEdges.head.getAs[String]("dst_name") == "maindb")
  }

  test("G6 purge reports the drop count on the retained action itself") {
    val obs = org.apache.spark.sql.Observation("purge-stats")
    val retained = GraphStore.purge(vertices,
      col("label") === "Microservice", Some(obs))
    assert(retained.count() == 2) // one job: retained rows + observed metric
    assert(obs.get("dropped") == 2L)
  }
}
