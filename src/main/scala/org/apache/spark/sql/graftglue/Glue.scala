package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` classic Column ⇄ Expression converters.
  *
  * Spark 4 moved `Column` to the connect-compatible sql-api layer; the only
  * supported way to wrap a custom Catalyst `Expression` into a `Column` in
  * the classic runtime is `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]`. Extension libraries conventionally expose it via
  * a shim object inside an `org.apache.spark.sql` subpackage — this is that
  * shim, kept to the two converters and nothing else.
  */
object Glue {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
