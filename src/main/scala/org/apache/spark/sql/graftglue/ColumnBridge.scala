package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 hides the classic Column(Expression) constructor behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); the
  * canonical extension-library workaround is a forwarder object living in a
  * subpackage of `org.apache.spark.sql`. Nothing else in the engine lives
  * outside the `graft` namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
