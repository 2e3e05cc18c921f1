package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MergeUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val existing = Seq(
    ("svc", "a", Some("old-ip"), Some(1.0), Seq("az1")),
    ("svc", "b", Some("b-ip"), Some(2.0), Seq("az2"))
  ).toDF("label", "name", "ip", "latency", "azs")

  private val incoming = Seq(
    // updates a: new latency, NO ip observed (None must preserve "old-ip"),
    // adds az2 to the az set
    ("svc", "a", Option.empty[String], Some(9.9), Seq("az2", "az1")),
    // brand-new vertex c
    ("svc", "c", Some("c-ip"), Some(3.0), Seq("az3"))
  ).toDF("label", "name", "ip", "latency", "azs")

  private def merge(ex: DataFrame, in: DataFrame): DataFrame =
    MergeUpsert(ex, in, Seq("label", "name"),
      singleCols = Seq("ip", "latency"), setCols = Seq("azs"))

  test("upsert: creates new rows, updates matched, preserves unmatched") {
    val out = merge(existing, incoming)
    val m = out.collect().map(r => r.getString(1) -> r).toMap
    assert(m.keySet == Set("a", "b", "c"))
    assert(m("a").getDouble(3) == 9.9)                       // last-wins
    assert(m("b").getDouble(3) == 2.0)                       // untouched row
    assert(m("c").getString(2) == "c-ip")                    // onCreate
  }

  test("absent (null) incoming value preserves existing — etl_aws:332") {
    val out = merge(existing, incoming)
    val a = out.filter($"name" === "a").collect().head
    assert(a.getString(2) == "old-ip")
  }

  test("set cardinality: sorted distinct union — etl_deepflow:709-746") {
    val out = merge(existing, incoming)
    val a = out.filter($"name" === "a").collect().head
    assert(a.getSeq[String](4) == Seq("az1", "az2"))
  }

  test("idempotence: merging the same batch twice is a fixpoint") {
    val once  = merge(existing, incoming)
    val twice = merge(once, incoming)
    assert(sortedRows(once) == sortedRows(twice))
  }

  test("map props: per-key overlay — incoming wins, absent/null preserves") {
    val ex = Seq(
      ("svc", "a", Map("env" -> "prod", "team" -> "core")),
      ("svc", "b", Map("env" -> "dev"))
    ).toDF("label", "name", "props")
    val in = Seq(
      // env updated, team NOT in batch (survives), tier added, owner null
      // (not observed → no entry created)
      ("svc", "a", Map("env" -> "staging", "tier" -> "gold",
        "owner" -> null.asInstanceOf[String])),
      ("svc", "c", Map("env" -> "test"))
    ).toDF("label", "name", "props")
    val out = MergeUpsert(ex, in, Seq("label", "name"),
      singleCols = Nil, mapCols = Seq("props"))
    val m = out.collect()
      .map(r => r.getString(1) -> r.getMap[String, String](2).toMap).toMap
    assert(m("a") == Map("env" -> "staging", "team" -> "core", "tier" -> "gold"))
    assert(m("b") == Map("env" -> "dev"))     // untouched row
    assert(m("c") == Map("env" -> "test"))    // created
    // idempotent: overlaying the same batch again changes nothing
    val twice = MergeUpsert(out, in, Seq("label", "name"),
      singleCols = Nil, mapCols = Seq("props"))
    val m2 = twice.collect()
      .map(r => r.getString(1) -> r.getMap[String, String](2).toMap).toMap
    assert(m2 == m)
  }

  test("map props: non-string value types merge (typed empty-map fallback)") {
    val ex = Seq(("svc", "a", Map("rps" -> 10L)))
      .toDF("label", "name", "metrics")
    val in = Seq(("svc", "a", Map("p99" -> 250L)), ("svc", "b", Map("rps" -> 5L)))
      .toDF("label", "name", "metrics")
    val out = MergeUpsert(ex, in, Seq("label", "name"),
      singleCols = Nil, mapCols = Seq("metrics"))
    val m = out.collect()
      .map(r => r.getString(1) -> r.getMap[String, Long](2).toMap).toMap
    assert(m("a") == Map("rps" -> 10L, "p99" -> 250L))
    assert(m("b") == Map("rps" -> 5L)) // created row: typed empty ex side
  }

  test("refreshMetrics never creates rows and only touches metric cols") {
    val metrics = Seq(("svc", "a", 7.7), ("svc", "zzz", 1.1))
      .toDF("label", "name", "latency")
    val out = MergeUpsert.refreshMetrics(existing, metrics,
      Seq("label", "name"), Seq("latency"))
    assert(out.count() == 2) // "zzz" not created
    val m = out.collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(m("a").getAs[Double]("latency") == 7.7)
    assert(m("a").getAs[String]("ip") == "old-ip")
    assert(m("b").getAs[Double]("latency") == 2.0)
  }
}
