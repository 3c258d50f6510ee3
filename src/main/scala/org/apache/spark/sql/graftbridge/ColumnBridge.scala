package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 gates these
  * conversions behind `private[sql]` (the Column API is backed by
  * ColumnNodes now); libraries that ship custom Catalyst expressions
  * conventionally expose them through a shim in an `o.a.s.sql`
  * subpackage. This is the only file outside the `graft` namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
