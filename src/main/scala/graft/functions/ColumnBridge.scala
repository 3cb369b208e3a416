package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters for
  * graft's native Catalyst expressions ([[graft.functions.DotProduct]] etc.).
  *
  * Spark 4 backs `Column` by a `ColumnNode`, and the classic converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`, so a
  * library defining its own `Expression`s needs either a registry injection
  * per session (`SparkSessionExtensions.injectFunction` + `call_function`) or
  * this package-placed shim. The shim keeps the Column API session-agnostic —
  * callers need no extension config.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
