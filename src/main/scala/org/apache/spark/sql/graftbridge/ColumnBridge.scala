package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Expression↔Column converters — the
  * standard technique for libraries that ship custom Catalyst
  * expressions (the public Column API deliberately hides expression
  * internals behind ColumnNode in Spark 4). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Ids of the checkpointed RDDs backing a (local)checkpoint'ed
    * Dataset — read directly off the plan's LogicalRDD leaves instead
    * of a global before/after getPersistentRDDs diff, so concurrent
    * jobs persisting their own RDDs can never be mis-attributed to an
    * index entry (and later unpersisted by releaseIndexes). */
  def checkpointedRddIds(ds: org.apache.spark.sql.Dataset[_]): Set[Int] =
    ds.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.toSet
}
