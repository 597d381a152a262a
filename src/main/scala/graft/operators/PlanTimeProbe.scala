package graft.operators

/** Dev probe (r19): split a registered query's wall into DataFrame
  * CONSTRUCTION (operator code + analysis), PLANNING (optimizer +
  * physical planning, forced via executedPlan), and EXECUTION — the
  * attribution a wall≫CPU query needs before any plan surgery, since
  * a union-of-N-legs report can spend its wall in Catalyst, not tasks.
  *
  * sbt "runMain graft.operators.PlanTimeProbe /root/testdata/sf0.1 q_ann_recall_families 3"
  */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = (if (args.length > 1) args(1) else "q_ann_recall_families")
      .split(",").map(_.trim).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val df = qs(n)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"[pt] $n%-26s rep$i construct ${(t1 - t0) / 1e9}%6.3f s  plan ${(t2 - t1) / 1e9}%6.3f s  exec ${(t3 - t2) / 1e9}%6.3f s")
      }
    }
    spark.stop()
  }
}
