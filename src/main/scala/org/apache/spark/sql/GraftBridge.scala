package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column <-> Expression conversion
  * (Spark 4.x moved Column onto ColumnNode; `classic.ExpressionUtils` is the
  * supported internal seam). Needed to expose custom
  * TypedImperativeAggregate sketches (KLL/HLL) as user-facing Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
