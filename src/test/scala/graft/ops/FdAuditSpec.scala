package graft.ops

import graft.SparkSpec

class FdAuditSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Option[Long], Option[String])],
      det: String = "k", dep: String = "v") =
    FdAudit.audit(rows.toDF("k", "v"), Seq(det -> dep))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5))).head

  test("a held dependency reports zero violations") {
    val out = run(Seq(Some(1L) -> Some("a"), Some(1L) -> Some("a"),
      Some(2L) -> Some("b")))
    assert(out === ((2L, 0L, 1L, true)))
  }

  test("violations counted per group with the worst cardinality") {
    val out = run(Seq(Some(1L) -> Some("a"), Some(1L) -> Some("b"),
      Some(1L) -> Some("c"), Some(2L) -> Some("x"), Some(2L) -> Some("y"),
      Some(3L) -> Some("z")))
    assert(out === ((3L, 2L, 3L, false)))
  }

  test("NULL determinants group together; NULL dependents are invisible") {
    // NULL-keyed rows form ONE group holding just "a" (the NULL dep
    // doesn't count) — the dependency holds
    val out = run(Seq(None -> Some("a"), None -> Some("a"), None -> None,
      Some(1L) -> Some("b")))
    assert(out === ((2L, 0L, 1L, true)))
  }

  test("multiple pairs audit independently in one call") {
    val df = Seq((1L, "a", "x"), (1L, "a", "y"), (2L, "b", "x"))
      .toDF("k", "u", "w")
    val out = FdAudit.audit(df, Seq("k" -> "u", "k" -> "w"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getBoolean(5))).toSet
    assert(out === Set(("k", "u", true), ("k", "w", false)))
  }
}
