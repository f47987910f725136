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

  /** The RDD backing a `localCheckpoint`ed frame (its analyzed plan is a
    * LogicalRDD) — lets iterative algorithms unpersist EXACTLY the
    * checkpoint they created, instead of diffing the context-global
    * persistent-RDD registry (which mis-attributes RDDs persisted by
    * concurrent jobs). None for any other plan shape.
    */
  def checkpointRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
