package graft.operators

/** Dev probe (r20): superstep plan shape of the BROADCAST rank path
  * with the dst-partitioned columnar edge cache — asserts whether the
  * per-superstep contribution aggregation still pays an Exchange.
  *
  * sbt "runMain graft.operators.RankCacheR20Probe /root/testdata/sf0.1 plans/r20/superstep_broadcast_after.txt"
  */
object RankCacheR20Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graph.capturedSuperstepPlan = None
    Graph.capturePlans = true
    try Graph.pagerankFullForced(spark, dir, coPartition = false).collect()
    finally Graph.capturePlans = false
    val plan = Graph.capturedSuperstepPlan.getOrElse(sys.error("no plan captured"))
    val nExchange = "(?m)^\\s*[+:]?-? ?Exchange ".r.findAllIn(plan).length +
      plan.linesIterator.count(_.trim.startsWith("+- Exchange")) // belt+braces
    println(s"[rcp] superstep plan Exchange lines: " +
      plan.linesIterator.count(_.contains("Exchange hashpartitioning")))
    println(plan)
    out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), plan))
    spark.stop()
  }
}
