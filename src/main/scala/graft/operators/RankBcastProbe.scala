package graft.operators

/** Dev probe (r19 optimization round): the BROADCAST rank-loop path's
  * per-superstep physical plan and steady timing — the co-partitioned
  * path's superstep shape is pinned by GraphSpec, but the broadcast
  * path (what every corpus below [[Graph.BroadcastMaxNodes]] nodes
  * serves, including the bench SFs) had no recorded plan. Prints the
  * first superstep's executed plan and best-of-3 warm wall/CPU for
  * pagerank + ppr so a plan change here carries before/after evidence.
  *
  * sbt "runMain graft.operators.RankBcastProbe /root/testdata/sf0.1"
  */
object RankBcastProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // steady-state serving: edge table memoized once, like the bench
    Graph.edgeFracs(spark, dir).count()
    Graph.capturePlans = true
    Graph.capturedSuperstepPlan = None
    Graph.pagerankFullForced(spark, dir, coPartition = false).count()
    Graph.capturePlans = false
    println("===== broadcast-path superstep plan =====")
    println(Graph.capturedSuperstepPlan.getOrElse("(not captured)"))
    def best3(tag: String)(f: => Long): Unit = {
      val ws = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag%-18s best ${ws.min}%.3f s  (samples ${ws.map(w => f"$w%.3f").mkString(" / ")})")
    }
    best3("pagerank warm")(Graph.pagerank(spark, dir).count())
    best3("ppr warm")(Graph.pagerankPersonalized(spark, dir).count())
    spark.stop()
  }
}
