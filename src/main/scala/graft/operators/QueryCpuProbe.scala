package graft.operators

/** Dev probe: wall + task-CPU of a handful of registered queries by
  * name — the fast A/B loop for a single query's plan change without
  * paying a full bench pass.
  *
  * sbt "runMain graft.operators.QueryCpuProbe /root/testdata/sf0.1 q_zorder_layout,q_token_budget 3"
  */
object QueryCpuProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = (if (args.length > 1) args(1) else "q_zorder_layout")
      .split(",").map(_.trim).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) cpuNs.addAndGet(m.executorCpuTime)
      }
    })
    spark.range(1 << 22).selectExpr("sum(id)").collect()
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val q = qs(n)
      (1 to reps).foreach { i =>
        val c0 = cpuNs.get(); val t0 = System.nanoTime()
        q(spark, dir).collect()
        Thread.sleep(300)
        println(f"[qcp] $n%-28s rep$i wall ${(System.nanoTime() - t0) / 1e9}%6.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%6.2f s")
      }
    }
    spark.stop()
  }
}
