package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made the conversion helpers
  * `private[sql]` (the Column facade is connect-agnostic); extension
  * libraries that ship native Catalyst expressions need exactly these two
  * calls, so this shim lives in the `org.apache.spark.sql` namespace —
  * the standard pattern for Spark-native extension projects.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
