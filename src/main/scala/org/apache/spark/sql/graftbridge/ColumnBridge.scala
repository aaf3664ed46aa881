package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression converters.
  *
  * Spark 4 moved `Column` to a ColumnNode representation in sql-api; the
  * classic converter (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * `private[sql]`, so third-party expression libraries conventionally expose
  * it via a shim in the `org.apache.spark.sql` package namespace. This is the
  * only file that lives outside the `graft` package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
