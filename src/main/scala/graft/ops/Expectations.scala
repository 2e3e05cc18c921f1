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
  *     a column, not a pass. An empty batch reports 0 violations
  *     (pass), never NULL.
  *   - `unique`: one groupBy on the key with a HAVING count — the same
  *     shuffle any duplicate check needs; violations = extra copies.
  *   - `foreignKey`: one left-anti join against the dimension's key set
  *     (broadcast when small) — violations = orphaned rows. NULL child
  *     keys are NOT counted (a null key is a `notNull` violation, not
  *     an orphan — and this keeps the operator equivalent to SQL
  *     `NOT IN` formulations, whose null semantics differ from an
  *     anti join).
  *
  * Output is a tiny union of per-family reports (rule name, violation
  * count, pass flag), deterministic by construction (exact counts).
  * Rule names are carried as typed literal columns — never spliced into
  * SQL text — so any name (quotes, backticks, duplicates) is safe.
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
    val reports = Seq.newBuilder[DataFrame]
    if (rowRules.nonEmpty) {
      // positional aliases (__r0, __r1, …): rule names stay in typed
      // lit() columns, immune to quoting and duplicates; coalesce turns
      // the empty-input NULL sum into the 0 a clean batch reports
      val aggs = rowRules.zipWithIndex.map { case (r, i) =>
        coalesce(sum(when(r.violation, 1L).otherwise(0L)), lit(0L))
          .as(s"__r$i")
      }
      val wide = df.agg(aggs.head, aggs.tail: _*)
      val entries = rowRules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col(s"__r$i").as("violations"))
      }
      reports += wide
        .select(explode(array(entries: _*)).as("e"))
        .select(col("e.rule"), col("e.violations"))
    }
    if (unique.nonEmpty) {
      reports += df.groupBy(unique.map(col): _*)
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .agg(coalesce(sum(col("n") - 1), lit(0L)).as("violations"))
        .select(lit(s"unique(${unique.mkString(",")})").as("rule"),
          col("violations"))
    }
    foreignKey.foreach { case (childKey, dim, dimKey) =>
      reports += df.select(col(childKey))
        .filter(col(childKey).isNotNull)
        .join(dim.select(col(dimKey).as(childKey)), Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(s"foreign_key($childKey->$dimKey)").as("rule"),
          col("violations"))
    }
    reports.result().reduce(_ unionAll _)
      .withColumn("pass", col("violations") === 0L)
  }

  /** The BATCH face of [[graft.streaming.QualityGate]]'s routing: audit
    * every `batchCol` group as its own batch and attach the gate's
    * decision — `publish` iff EVERY rule passes for that group, else
    * `quarantine` (whole batch, same all-or-nothing rule as the
    * stream's foreachBatch). One scan: per-group conditional aggregates
    * unpivoted to one (batch, rule) row, the routing decision a window
    * bool_and over the group — no second pass, no join. Hash-gated by
    * `q_quality_gate`; the streaming twin is spec-gated
    * (QualityGateSpec) with this as its oracle face. */
  def auditRouted(df: DataFrame, batchCol: String,
      rowRules: Seq[RowRule]): DataFrame = {
    require(rowRules.nonEmpty, "no rules given")
    val aggs = rowRules.zipWithIndex.map { case (r, i) =>
      coalesce(sum(when(r.violation, 1L).otherwise(0L)), lit(0L))
        .as(s"__r$i")
    }
    val wide = df.groupBy(col(batchCol)).agg(aggs.head, aggs.tail: _*)
    val entries = rowRules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"__r$i").as("violations"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(batchCol))
    wide
      .select(col(batchCol), explode(array(entries: _*)).as("e"))
      .select(col(batchCol), col("e.rule").as("rule"),
        col("e.violations").as("violations"))
      .withColumn("pass", col("violations") === 0L)
      .withColumn("route",
        when(bool_and(col("pass")).over(w), lit("publish"))
          .otherwise(lit("quarantine")))
  }
}
