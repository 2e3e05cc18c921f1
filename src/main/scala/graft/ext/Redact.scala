package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-data curation: scrub emails, phone
  * numbers, IP addresses (or any caller-supplied regex rules) out of a
  * text column, and report how many hits each rule removed — the audit
  * trail a compliance pass needs ("how much PII did this corpus
  * contain?") without a second job.
  *
  * Rules apply IN ORDER, each to the output of the previous one, and
  * each rule's count is measured on the text as it stood when the rule
  * ran — so overlapping patterns never double-count (an IP inside an
  * already-redacted email token is gone before the IP rule looks).
  *
  * Shape for 100 TB: pure per-row regex expressions — no shuffle, no
  * state, embarrassingly parallel, stays in whole-stage codegen. Cost
  * is O(rules²) regex passes per row because each count column re-derives
  * its stage input; with the handful of rules a redaction pass uses,
  * that is noise against the scan itself.
  *
  * Patterns stick to the regex subset Java and RE2 share (classes,
  * bounded repeats, `\b`, `\d`) so results are engine-reproducible.
  */
object Redact {

  /** (name, pattern, replacement) — count column emitted as `n_<name>`. */
  type Rule = (String, String, String)

  // Default rules are a practical starting set, not a compliance
  // guarantee — production scrubbing should supply vetted rules.
  // email is case-insensitive ((?i) — Java and RE2 both support it);
  // phone covers NANP shapes: 555-867-5309, 555.867.5309, (555) 867-5309,
  // +1-555-867-5309. The bare-digits branch anchors on \b so a longer
  // digit run never yields a partial match.
  val email: Rule =
    ("email", "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>")
  val ipv4: Rule = ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
  val phone: Rule = ("phone",
    "(\\+?1[-. ])?(\\(\\d{3}\\) ?|\\b\\d{3}[-. ])\\d{3}[-. ]\\d{4}\\b",
    "<PHONE>")

  def scrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rules: Seq[Rule] = Seq(email, ipv4, phone)
  ): DataFrame = {
    require(rules.nonEmpty, "scrub needs at least one rule")
    val (finalText, counts) =
      rules.foldLeft((col(textCol), Seq.empty[Column])) {
        case ((t, cs), (name, pat, repl)) =>
          val c = size(regexp_extract_all(t, lit(pat), lit(0)))
            .cast("long").as(s"n_$name")
          (regexp_replace(t, pat, repl), cs :+ c)
      }
    docs.select(col(idCol) +: finalText.as("redacted") +: counts: _*)
  }
}
