package graft.ops

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added / removed / changed; unchanged rows vanish") {
    val old = Seq(
      ("EC2", "i-1", "healthy"),
      ("EC2", "i-2", "healthy"),
      ("EC2", "i-3", "degraded")
    ).toDF("label", "name", "health")
    val cur = Seq(
      ("EC2", "i-1", "healthy"),  // unchanged → no row
      ("EC2", "i-2", "degraded"), // changed
      ("EC2", "i-4", "healthy")   // added; i-3 removed
    ).toDF("label", "name", "health")
    val out = SnapshotDiff(old, cur, Seq("label", "name"), Seq("health"))
      .collect().map(r => r.getAs[String]("name") ->
        (r.getAs[String]("change_type"),
          Option(r.getAs[String]("old_health")),
          Option(r.getAs[String]("new_health")))).toMap
    assert(out == Map(
      "i-2" -> (("changed", Some("healthy"), Some("degraded"))),
      "i-3" -> (("removed", Some("degraded"), None)),
      "i-4" -> (("added", None, Some("healthy")))))
  }

  test("null-safe compare: null→value and value→null are changes") {
    val old = Seq(("k1", Option("a")), ("k2", Option.empty[String]),
      ("k3", Option.empty[String])).toDF("k", "v")
    val cur = Seq(("k1", Option.empty[String]), ("k2", Option("b")),
      ("k3", Option.empty[String])).toDF("k", "v")
    val out = SnapshotDiff(old, cur, Seq("k"), Seq("v"))
      .select("k", "change_type").as[(String, String)].collect().toMap
    assert(out == Map("k1" -> "changed", "k2" -> "changed")) // k3 unchanged
  }
}
