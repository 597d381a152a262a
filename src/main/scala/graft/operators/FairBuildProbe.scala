package graft.operators

/** Dev probe: does FAIR-pool weighting of the index job's critical
  * chain (docShingles → shingleIndex → jaccardPairs → clusterLabels)
  * against the sibling chains shorten the build wall? FIFO vs FAIR
  * with an 8:1 critical-pool weight, alternating runs.
  *
  * sbt "runMain graft.operators.FairBuildProbe /root/testdata/sf0.1"
  */
object FairBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val allocXml = java.nio.file.Files.createTempFile("graft-pools", ".xml")
    java.nio.file.Files.writeString(allocXml,
      """<?xml version="1.0"?>
        |<allocations>
        |  <pool name="critical"><weight>8</weight><schedulingMode>FIFO</schedulingMode></pool>
        |  <pool name="bulk"><weight>1</weight><schedulingMode>FIFO</schedulingMode></pool>
        |</allocations>""".stripMargin)
    val fair = args.length > 1 && args(1) == "fair"
    val b = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val spark = (if (fair)
      b.config("spark.scheduler.mode", "FAIR")
        .config("spark.scheduler.allocation.file", allocXml.toString)
      else b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").count()
    (1 to 3).foreach { i =>
      val idx = java.nio.file.Files.createTempDirectory("graft_fair").toString
      Dedup.releaseIndexes(spark)
      val t0 = System.nanoTime()
      Dedup.writeIndexes(spark, dir, idx)
      println(f"[probe] ${if (fair) "FAIR" else "FIFO"} run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
