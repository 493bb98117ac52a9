package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression converters — the supported
  * way to hand a custom Catalyst `Expression` to the public DataFrame API
  * without registering a FunctionBuilder. Lives in the spark.sql package
  * solely for access; no Spark internals are modified. */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
