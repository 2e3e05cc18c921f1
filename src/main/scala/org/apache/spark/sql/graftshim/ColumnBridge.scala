package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression interop for the engine's native expressions.
  *
  * Spark 4 moved Column onto ColumnNode and made the conversion helpers
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); a
  * library adding Catalyst expressions still needs exactly those two
  * functions, so this one-file shim lives under the sql package to reach
  * them. No other Spark internals are touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
