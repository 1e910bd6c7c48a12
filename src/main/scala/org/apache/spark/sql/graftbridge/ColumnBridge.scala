package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(expr)/Column.expr bridge; the classic
  * conversion lives in private[sql] ExpressionUtils. This object re-exports
  * the two conversions for graft's custom Catalyst expressions (the standard
  * extension-library pattern for Spark 4's ColumnNode API).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
