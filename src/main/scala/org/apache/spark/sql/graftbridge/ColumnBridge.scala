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

  /** Eager persisted checkpoint that DECLARES a hash partitioning +
    * intra-partition ordering on the result, so downstream joins on
    * the key plan exchange-free against other tables declared (or
    * shuffled) the same way.
    *
    * Why this exists: `Dataset.localCheckpoint` copies
    * `executedPlan.outputPartitioning` into the LogicalRDD it builds —
    * but under AQE the executed plan is an AdaptiveSparkPlanExec,
    * whose outputPartitioning is `UnknownPartitioning` at that point,
    * so the checkpoint silently forgets the layout and every
    * superstep-style iteration re-shuffles what is already correctly
    * partitioned data. This helper executes the plan, persists the
    * rows, and constructs the LogicalRDD with the partitioning stated
    * explicitly.
    *
    * With `reshape = true` the declaration is MADE true first
    * (repartition(numPartitions, key) + sortWithinPartitions). With
    * `reshape = false` the caller asserts the plan already produces
    * that layout (e.g. the output of a join whose required
    * distribution was exactly this) — declaring a layout the data
    * does not have yields silently wrong joins, so reshape=false
    * call sites must be parity-tested. */
  def checkpointDeclared(df: org.apache.spark.sql.DataFrame, key: String,
      numPartitions: Int, reshape: Boolean,
      level: org.apache.spark.storage.StorageLevel): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.LogicalRDD
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val shaped =
      if (reshape) df.repartition(numPartitions, df(key)).sortWithinPartitions(key)
      else df
    val qe = shaped.queryExecution
    // UnsafeRow buffers are reused per-partition — copy before persist,
    // exactly as Dataset.checkpoint does
    val rdd = qe.executedPlan.execute().map(_.copy())
    rdd.setName(s"graft declared-checkpoint $key/$numPartitions")
    rdd.persist(level)
    rdd.count() // eager: materialize now, under this query's lifetime
    val output = qe.analyzed.output
    val keyAttr = output.find(_.name == key).getOrElse(
      throw new IllegalArgumentException(
        s"checkpointDeclared: no column '$key' in ${output.map(_.name)}"))
    org.apache.spark.sql.classic.Dataset.ofRows(spark,
      LogicalRDD(output, rdd,
        HashPartitioning(Seq(keyAttr), numPartitions),
        Seq(SortOrder(keyAttr, Ascending)),
        isStreaming = false)(spark))
  }
}
