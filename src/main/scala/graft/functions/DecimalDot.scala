package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Exact, order-independent dot product of two numeric vectors as a native
  * codegen expression — the whole-stage-codegen replacement for the
  * interpreted `aggregate(zip_with(...))` decimal fold (higher-order
  * functions never enter codegen, and the fold was the single interpreted
  * expression family on the engine's hot paths: every ANN / embedding-dedup
  * score pays it per pair).
  *
  * Bit-for-bit identical to the HOF formulation (and therefore to the
  * DuckDB oracle): each element product is computed in double, converted
  * via the decimal string representation (`BigDecimal.valueOf`, exactly
  * Spark's double→decimal cast) and rounded HALF_UP to scale 15; the sum
  * is exact decimal arithmetic; only the final value returns to double.
  * Null semantics mirror `zip_with`+`aggregate`: null array, null element,
  * or length mismatch (zip_with pads with null) → null result.
  */
case class DecimalDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "decimal_dot"

  // `decimal_dot` is SQL-registered, so arbitrary user types can reach it:
  // fail analysis with a named error instead of a runtime ClassCastException.
  override def checkInputDataTypes(): TypeCheckResult = {
    def vecType(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (vecType(left.dataType) && vecType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def isFloatArr(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DecimalDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left), isFloatArr(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.DecimalDot.compute(
         |  $a, $b, ${isFloatArr(left)}, ${isFloatArr(right)});
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalDot =
    copy(left = newLeft, right = newRight)
}

object DecimalDot {
  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DecimalDot].getName, "decimal_dot")

  /** Imperative registration (tests, ad-hoc sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("decimal_dot"), info,
      (children: Seq[Expression]) => DecimalDot(children(0), children(1)))

  /** Shared by interpreted eval and generated code. Returns null on length
    * mismatch or null elements (the `zip_with` null-padding semantics),
    * and on NaN/Infinity products (the non-ANSI double→decimal cast the
    * HOF fold documents — `BigDecimal.valueOf` would otherwise THROW, and
    * one malformed embedding must not kill a corpus-scale scoring job). */
  def compute(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val p = x * y
      if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p))
        return null
      acc = acc.add(java.math.BigDecimal.valueOf(p)
        .setScale(15, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue())
  }
}
