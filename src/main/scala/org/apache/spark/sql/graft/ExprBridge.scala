package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge.
  *
  * Spark 4's `Column` wraps a connect-compatible `ColumnNode` rather than a
  * Catalyst `Expression`; the classic-mode converters live behind
  * `private[sql]`. This one-file subpackage exposes exactly the two
  * conversions graft's custom expressions need — the same mechanism Spark's
  * own classic DataFrame API uses internally (columnNodeSupport.scala).
  */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
