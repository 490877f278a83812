package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column independent of catalyst Expressions; the official
  * bridge (classic.ExpressionUtils) is private[sql]. This shim lives in a
  * subpackage of org.apache.spark.sql purely to re-export the two
  * conversions our custom expressions need. No Spark internals are
  * reimplemented here. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
