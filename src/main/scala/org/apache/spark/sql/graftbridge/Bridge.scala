package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(Expression)` constructor in the
  * Spark Connect refactor; the classic bridge lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This shim re-exports it for graft's custom
  * Catalyst expressions. No Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
