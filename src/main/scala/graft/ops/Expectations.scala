package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the validation gate a pipeline runs on
  * every batch before publishing: declarative rules audited into one
  * (rule, violations, pass) report. The report never throws; callers
  * gate on `pass` so a bad batch is quarantined with evidence, not
  * half-written.
  *
  * Rule families and their cost shapes:
  *   - ROW rules (not-null, range, custom predicate): ALL audit in a
  *     single conditional aggregate over ONE scan — adding a rule adds
  *     a column, not a pass.
  *   - `unique`: one groupBy on the key with a HAVING count — the same
  *     shuffle any duplicate check needs; violations = extra copies.
  *   - `foreignKey`: one left-anti join against the dimension's key set
  *     (broadcast when small) — violations = orphaned rows.
  *
  * Output is a tiny union of per-family reports (rule name, violation
  * count, pass flag), deterministic by construction (exact counts).
  */
object Expectations {

  /** A row-level rule: `name` and the VIOLATION predicate. */
  final case class RowRule(name: String, violation: Column)

  def notNull(c: String): RowRule =
    RowRule(s"not_null($c)", col(c).isNull)

  def inRange(c: String, lo: Double, hi: Double): RowRule =
    RowRule(s"in_range($c,$lo,$hi)",
      col(c).isNull || col(c) < lo || col(c) > hi)

  /** Audit `rowRules` in one aggregate, plus optional `unique` key and
    * `foreignKey` (childKey, dimension, dimKey) checks. */
  def audit(df: DataFrame, rowRules: Seq[RowRule],
      unique: Seq[String] = Nil,
      foreignKey: Option[(String, DataFrame, String)] = None): DataFrame = {
    require(rowRules.nonEmpty || unique.nonEmpty || foreignKey.nonEmpty,
      "no rules given")
    val spark = df.sparkSession
    import spark.implicits._
    val reports = Seq.newBuilder[DataFrame]
    if (rowRules.nonEmpty) {
      val aggs = rowRules.map(r =>
        sum(when(r.violation, 1L).otherwise(0L)).as(r.name))
      val wide = df.agg(aggs.head, aggs.tail: _*)
      // one row → stack to (rule, violations) without a second scan
      val stackArgs = rowRules.map(r => s"'${r.name}', `${r.name}`")
        .mkString(", ")
      reports += wide.select(expr(
        s"stack(${rowRules.size}, $stackArgs) AS (rule, violations)"))
    }
    unique.headOption.foreach { _ =>
      reports += df.groupBy(unique.map(col): _*)
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .agg(coalesce(sum(col("n") - 1), lit(0L)).as("violations"))
        .select(lit(s"unique(${unique.mkString(",")})").as("rule"),
          col("violations"))
    }
    foreignKey.foreach { case (childKey, dim, dimKey) =>
      reports += df.select(col(childKey))
        .join(dim.select(col(dimKey).as(childKey)), Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(s"foreign_key($childKey->$dimKey)").as("rule"),
          col("violations"))
    }
    reports.result().reduce(_ unionAll _)
      .withColumn("pass", col("violations") === 0L)
  }
}
