package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Dev probe (r19): can the graph family serve its flat-scan geometry
  * from the BUCKETED by-src files with a read-time coalesce(nOut),
  * instead of maintaining a second (flat) copy of the edge table?
  * If serving CPU matches the flat artifact, the index job can drop
  * the flat re-encode stage (~3 CPU-s at sf0.1) and the 100 TB layout
  * stops storing the edge table twice.
  *
  * sbt "runMain graft.operators.GraphCoalesceProbe /root/testdata/sf0.1"
  */
object GraphCoalesceProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) cpuNs.addAndGet(m.executorCpuTime)
      }
    })
    spark.range(1 << 20).selectExpr("sum(id)").count()
    def t(name: String)(f: => Any): Unit = {
      Thread.sleep(300)
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      val n = f
      Thread.sleep(300)
      println(f"[gcp] $name%-44s ${(System.nanoTime() - t0) / 1e9 - 0.3}%6.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%6.2f s  ($n)")
    }
    val idx = java.nio.file.Files.createTempDirectory("graft_gcp").toString
    Dedup.writeIndexes(spark, dir, idx)
    val flat = s"$idx/graphEdgeFracs.parquet"
    val bySrc = s"$idx/graphEdgesBySrc"
    val nOut = spark.read.parquet(flat).rdd.getNumPartitions
    println(s"[gcp] flat scan partitions (nOut): $nOut; " +
      s"bySrc scan partitions: ${spark.read.parquet(bySrc).rdd.getNumPartitions}")
    def checksum(): Long = Graph.pagerank(spark, dir)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.hash(
          org.apache.spark.sql.functions.col("node"),
          org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.col("rank"), 9)).cast("long")))
      .first().getLong(0)
    Seq("flat", "coalesce").foreach { variant =>
      (1 to 3).foreach { i =>
        t(s"q_graph_pagerank ($variant) rep$i") {
          Dedup.releaseIndexes(spark); Dedup.primeIndexes(spark, dir, idx)
          if (variant == "coalesce") {
            Dedup.memoDrop(spark, s"graphEdgeFracs|$dir")
            Dedup.memoPut(spark, s"graphEdgeFracs|$dir",
              spark.read.parquet(bySrc).coalesce(nOut))
          }
          Graph.pagerank(spark, dir).count()
        }
      }
      (1 to 3).foreach { i =>
        t(s"q_graph_ppr ($variant) rep$i") {
          Dedup.releaseIndexes(spark); Dedup.primeIndexes(spark, dir, idx)
          if (variant == "coalesce") {
            Dedup.memoDrop(spark, s"graphEdgeFracs|$dir")
            Dedup.memoPut(spark, s"graphEdgeFracs|$dir",
              spark.read.parquet(bySrc).coalesce(nOut))
          }
          Graph.pagerankPersonalized(spark, dir).count()
        }
      }
      Dedup.releaseIndexes(spark); Dedup.primeIndexes(spark, dir, idx)
      if (variant == "coalesce") {
        Dedup.memoDrop(spark, s"graftEdgeFracs|$dir") // no-op guard
        Dedup.memoDrop(spark, s"graphEdgeFracs|$dir")
        Dedup.memoPut(spark, s"graphEdgeFracs|$dir",
          spark.read.parquet(bySrc).coalesce(nOut))
      }
      println(s"[gcp] pagerank checksum ($variant): ${checksum()}")
    }
    spark.stop()
  }
}
