package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DegreeMetricsSpec extends SparkSpec {
  import spark.implicits._

  // graph: a->b, a->c(rds), b->c(rds); d isolated
  private val nodes = Seq("a", "b", "c", "d").toDF("node_id")
  private val edges = Seq(
    ("a", "b", "svc"), ("a", "c", "rds"), ("b", "c", "rds")
  ).toDF("src", "dst", "dst_label")

  test("out/in/filtered degrees + entry-point flag (etl_deepflow:536-568)") {
    val out = DegreeMetrics(nodes, "node_id", edges, "src", "dst",
      Seq("rds_out" -> (col("dst_label") === "rds")))
      .collect().map(r => r.getAs[String]("node_id") -> r).toMap

    assert(out("a").getAs[Long]("out_degree") == 2)
    assert(out("a").getAs[Long]("rds_out") == 1)
    assert(out("a").getAs[Long]("in_degree") == 0)
    assert(out("a").getAs[Boolean]("is_entry_point"))

    assert(out("b").getAs[Long]("out_degree") == 1)
    assert(out("b").getAs[Long]("in_degree") == 1)
    assert(!out("b").getAs[Boolean]("is_entry_point"))

    assert(out("c").getAs[Long]("out_degree") == 0)
    assert(out("c").getAs[Long]("in_degree") == 2)

    assert(out("d").getAs[Long]("out_degree") == 0)
    assert(out("d").getAs[Boolean]("is_entry_point"))
  }
}
