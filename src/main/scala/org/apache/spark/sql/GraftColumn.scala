package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and catalyst Expressions.
  * Spark 4 made `ExpressionUtils` private[sql]; this shim (compiled into
  * the spark.sql package, a standard extension-library technique) is the
  * only place the engine crosses that boundary.
  */
object GraftColumn {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
