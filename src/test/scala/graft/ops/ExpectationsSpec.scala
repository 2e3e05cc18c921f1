package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val child = Seq(
    (1L, Some(10.0), 100L), (2L, Some(60.0), 100L), // 60 out of range
    (3L, None, 200L),                               // null value
    (3L, Some(5.0), 999L)                           // dup id 3, orphan 999
  ).toDF("id", "v", "fk")
  private val dim = Seq(100L, 200L).toDF("k")

  test("row, uniqueness and FK rules audit into one pass/fail report") {
    val out = Expectations.audit(child,
      rowRules = Seq(Expectations.notNull("v"),
        Expectations.inRange("v", 0.0, 50.0)),
      unique = Seq("id"),
      foreignKey = Some(("fk", dim, "k")))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("not_null(v)") == ((1L, false)))
    // range: 60 violates, null violates (unparseable is not in range)
    assert(out("in_range(v,0.0,50.0)") == ((2L, false)))
    assert(out("unique(id)") == ((1L, false)))   // one extra copy of id 3
    assert(out("foreign_key(fk->k)") == ((1L, false)))
    assert(out.size == 4)
  }

  test("an empty batch reports 0 violations and passes — never NULL") {
    val empty = Seq.empty[(Long, Option[Double], Long)].toDF("id", "v", "fk")
    val out = Expectations.audit(empty,
      rowRules = Seq(Expectations.notNull("v")),
      unique = Seq("id"), foreignKey = Some(("fk", dim, "k")))
      .as[(String, Long, Boolean)].collect()
    assert(out.length == 3)
    assert(out.forall { case (_, viol, pass) => viol == 0L && pass })
  }

  test("rule names with quotes or backticks are safe (typed columns)") {
    val df = Seq((1L, Some(1.0), 100L)).toDF("id", "v", "fk")
    val out = Expectations.audit(df, rowRules = Seq(
      Expectations.RowRule("o'brien`s rule", col("v").isNull)))
      .as[(String, Long, Boolean)].collect()
    assert(out.toSeq == Seq(("o'brien`s rule", 0L, true)))
  }

  test("auditRouted: per-batch rules, all-or-nothing routing per group") {
    // batch a: clean on both rules → publish; batch b: one in_range
    // violation → the WHOLE batch (both rule rows) quarantines; batch c:
    // null v violates not_null AND in_range → quarantine, counted once
    // per rule
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)),
      ("b", Some(1.0)), ("b", Some(99.0)),
      ("c", None: Option[Double])).toDF("batch", "v")
    val out = Expectations.auditRouted(df, "batch", Seq(
      Expectations.notNull("v"), Expectations.inRange("v", 0.0, 10.0)))
      .as[(String, String, Long, Boolean, String)].collect().toSet
    assert(out == Set(
      ("a", "not_null(v)", 0L, true, "publish"),
      ("a", "in_range(v,0.0,10.0)", 0L, true, "publish"),
      ("b", "not_null(v)", 0L, true, "quarantine"),
      ("b", "in_range(v,0.0,10.0)", 1L, false, "quarantine"),
      ("c", "not_null(v)", 1L, false, "quarantine"),
      ("c", "in_range(v,0.0,10.0)", 1L, false, "quarantine")))
  }

  test("a clean batch passes every rule with zero violations") {
    val clean = Seq((1L, Some(1.0), 100L)).toDF("id", "v", "fk")
    val out = Expectations.audit(clean,
      rowRules = Seq(Expectations.notNull("v")),
      unique = Seq("id"), foreignKey = Some(("fk", dim, "k")))
    assert(out.filter(!col("pass")).count() == 0)
    assert(out.count() == 3)
  }
}
