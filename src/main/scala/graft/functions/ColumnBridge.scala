// Lives under org.apache.spark.sql so it can reach the private[sql]
// Column <-> Expression converters — the standard technique for libraries
// that ship custom Catalyst expressions (Spark exposes no public API for
// wrapping an Expression into a Column since the 4.x Column-node split).
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
