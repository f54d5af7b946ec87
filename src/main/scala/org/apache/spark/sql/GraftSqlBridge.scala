package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column<->Expression converters —
  * the standard technique for extension libraries that ship custom
  * Catalyst expressions (Spark 4 made `Column` wrap a ColumnNode and
  * hid the direct constructors behind `org.apache.spark.sql.classic`).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
