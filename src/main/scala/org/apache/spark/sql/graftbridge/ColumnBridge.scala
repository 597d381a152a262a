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
    // reliable mode (spark.graft.checkpointDir): ALSO checkpoint the
    // persisted rows to the shared dir, so an executor loss recomputes
    // from files instead of killing the iteration — the persisted copy
    // still serves the fast path; the files are the recovery path
    val ckDir = spark.conf.get("spark.graft.checkpointDir", "")
    if (ckDir.nonEmpty) {
      if (spark.sparkContext.getCheckpointDir.isEmpty)
        spark.sparkContext.setCheckpointDir(ckDir)
      rdd.checkpoint()
    }
    rdd.count() // eager: materialize now, under this query's lifetime
    val output = qe.analyzed.output
    val keyAttr = output.find(_.name == key).getOrElse(
      throw new IllegalArgumentException(
        s"checkpointDeclared: no column '$key' in ${output.map(_.name)}"))
    // reshape=false means the CALLER asserts the executed child plan
    // already laid rows out as HashPartitioning(key, numPartitions) —
    // if an AQE or planner change ever breaks that assumption, every
    // downstream exchange-free join returns silently wrong results.
    // Guard: evaluate HashPartitioning's own partition-id expression
    // (murmur3(key, seed 42) pmod n) on a few sampled rows per
    // persisted partition and require it to match the partition the
    // row actually landed in. The scan rides the just-persisted
    // blocks (a handful of rows per partition), so the cost is one
    // tiny narrow job per checkpoint; disable with
    // spark.graft.verify.declaredPartitioning=false if even that
    // matters in a hot loop.
    if (!reshape && spark.conf
          .get("spark.graft.verify.declaredPartitioning", "true").toBoolean) {
      import org.apache.spark.sql.catalyst.expressions.{BindReferences, Murmur3Hash}
      val check = BindReferences.bindReference(
        new Murmur3Hash(Seq(keyAttr)): Expression, output)
      val n = numPartitions
      // collect(), not take(1): the healthy case returns ZERO rows, and
      // take's incremental partition scan turns "empty" into up to 4
      // scheduling rounds per checkpoint — measurable wall inside a
      // superstep loop. collect is one job of trivial tasks over the
      // just-persisted blocks.
      val bad = rdd.mapPartitionsWithIndex { (pid, it) =>
        it.take(8).flatMap { row =>
          val h = check.eval(row).asInstanceOf[Int]
          val expected = ((h % n) + n) % n
          if (expected != pid) Iterator((pid, expected)) else Iterator.empty
        }
      }.collect()
      require(bad.isEmpty,
        s"checkpointDeclared(reshape=false): declared HashPartitioning('$key', $n) " +
          s"does not match the executed layout — a sampled row in partition " +
          s"${bad.head._1} hashes to partition ${bad.head._2}. The caller's " +
          "exchange-free assumption is broken; use reshape=true or fix the child plan.")
    }
    org.apache.spark.sql.classic.Dataset.ofRows(spark,
      LogicalRDD(output, rdd,
        HashPartitioning(Seq(keyAttr), numPartitions),
        Seq(SortOrder(keyAttr, Ascending)),
        isStreaming = false)(spark))
  }
}
