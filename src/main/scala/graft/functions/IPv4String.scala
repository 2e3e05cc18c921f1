package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** F1 — `IPv4NumToString` (ClickHouse,
  * `lambda/etl_deepflow/neptune_etl_deepflow.py:148`) as a native Catalyst
  * expression: uint32 (carried in a long) → dotted-quad string.
  *
  * Chosen over a Scala UDF deliberately (SURVEY.md §2.11 preference
  * order): `doGenCode` keeps the expression inside whole-stage codegen —
  * no boxing, no serialization boundary, null handling for free via
  * `nullSafeCodeGen`. The composed-builtins equivalent
  * (`concat_ws` + 4×`shiftright`/`&`) is also codegen'd but materializes
  * four intermediate UTF8Strings; this emits one `StringBuilder`-free
  * concatenation.
  */
case class IPv4String(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "ipv4_str"

  override protected def nullSafeEval(input: Any): Any = {
    val ip = input.asInstanceOf[Long]
    UTF8String.fromString(IPv4String.format(ip))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.IPv4String.format($c))")

  override protected def withNewChildInternal(newChild: Expression): IPv4String =
    copy(child = newChild)
}

object IPv4String {
  /** Shared by interpreted eval and generated code. */
  def format(ip: Long): String =
    new java.lang.StringBuilder(15)
      .append((ip >> 24) & 255).append('.')
      .append((ip >> 16) & 255).append('.')
      .append((ip >> 8) & 255).append('.')
      .append(ip & 255).toString

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[IPv4String].getName, "ipv4_str")

  /** Builder: integer inputs of any width are cast up to long
    * (AbstractDataType/ImplicitCastInputTypes is package-private, so the
    * cast is explicit here instead). */
  def build(children: Seq[Expression]): IPv4String =
    IPv4String(Cast(children.head, LongType))

  /** Imperative registration (tests, ad-hoc sessions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ipv4_str"), info, build _)
}
