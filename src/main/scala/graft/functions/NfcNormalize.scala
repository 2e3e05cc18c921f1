package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the text
  * canonicalization pass a multilingual corpus pipeline runs before
  * hashing/dedup: visually identical strings with different codepoint
  * sequences (composed é vs e + COMBINING ACUTE) must collapse to one
  * form, or exact dedup and shingle hashing silently treat them as
  * distinct documents.
  *
  * Native expression over a Scala UDF (SURVEY.md §2.11 preference
  * order): `doGenCode` keeps the call inside whole-stage codegen — no
  * boxing or serialization boundary, null handling via the unary
  * null-safe path. The fast path costs one `Normalizer.isNormalized`
  * scan (true for pure-ASCII and already-composed text, i.e. almost the
  * whole corpus) and only allocates when composition actually changes
  * the string. NFC (not NFKC) so the transform is round-trip-safe and
  * matches DuckDB's `nfc_normalize` for the oracle.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  // SQL-registered, so arbitrary user types can reach it: fail analysis
  // with a named error instead of a runtime ClassCastException (the same
  // contract as DecimalDot in this package)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalize].getName, "nfc_normalize")

  def build(children: Seq[Expression]): NfcNormalize = {
    if (children.size != 1) throw new IllegalArgumentException(
      s"nfc_normalize expects exactly 1 argument, got ${children.size}")
    NfcNormalize(children.head)
  }

  /** Imperative registration (tests, ad-hoc sessions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nfc_normalize"), info, build _)
}
