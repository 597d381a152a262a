package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Dev probe: graph-family serving CPU under the exact bench context
  * (writeIndexes → release → prime → query), comparing the r18
  * copied-bucketed flat edge artifact against a plain rewrite of the
  * same rows — the bench's graph CPU axis tripled after the layout
  * change and the read-side microbenchmarks disagreed.
  *
  * sbt "runMain graft.operators.GraphServeProbe /root/testdata/sf0.1"
  */
object GraphServeProbe {
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
      println(f"[gsp] $name%-40s ${(System.nanoTime() - t0) / 1e9 - 0.3}%6.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%6.2f s  ($n)")
    }
    val idx = java.nio.file.Files.createTempDirectory("graft_gsp").toString
    Dedup.writeIndexes(spark, dir, idx)
    Dedup.releaseIndexes(spark)
    Dedup.primeIndexes(spark, dir, idx)
    val flat = s"$idx/graphEdgeFracs.parquet"
    def inventory(): Unit = {
      val fs = new org.apache.hadoop.fs.Path(flat)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(flat), true)
      var nf = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) nf += 1 }
      val parts = spark.read.parquet(flat).rdd.getNumPartitions
      println(s"[gsp] flat artifact: $nf files, $parts scan partitions")
    }
    inventory()
    (1 to 3).foreach { i =>
      t(s"q_graph_degree (copied-bucketed) rep$i") {
        Graph.degreeHistogram(spark, dir).count()
      }
    }
    (1 to 3).foreach { i =>
      t(s"q_graph_pagerank (copied-bucketed) rep$i") {
        Dedup.releaseIndexes(spark); Dedup.primeIndexes(spark, dir, idx)
        Graph.pagerank(spark, dir).count()
      }
    }
    // variant B: plain rewrite of the same rows as the flat artifact
    val rows = spark.read.parquet(flat).drop("batch_id")
    rows.write.mode("overwrite").parquet(s"$idx/.tmp-flat")
    val fs = new org.apache.hadoop.fs.Path(flat)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(flat), true)
    spark.read.parquet(s"$idx/.tmp-flat")
      .write.mode("overwrite").parquet(s"$flat/batch_id=base")
    inventory()
    (1 to 3).foreach { i =>
      t(s"q_graph_degree (plain rewrite) rep$i") {
        Dedup.releaseIndexes(spark); Dedup.primeIndexes(spark, dir, idx)
        Graph.degreeHistogram(spark, dir).count()
      }
    }
    (1 to 3).foreach { i =>
      t(s"q_graph_pagerank (plain rewrite) rep$i") {
        Dedup.releaseIndexes(spark); Dedup.primeIndexes(spark, dir, idx)
        Graph.pagerank(spark, dir).count()
      }
    }
    // variant C: the r17 geometry — few beefy files (AQE coalesced the
    // old plan write to ~9 partitions)
    val rows9 = spark.read.parquet(flat).drop("batch_id").coalesce(9)
    rows9.write.mode("overwrite").parquet(s"$idx/.tmp-flat9")
    fs.delete(new org.apache.hadoop.fs.Path(flat), true)
    spark.read.parquet(s"$idx/.tmp-flat9").coalesce(9)
      .write.mode("overwrite").parquet(s"$flat/batch_id=base")
    inventory()
    (1 to 3).foreach { i =>
      t(s"q_graph_degree (9-file rewrite) rep$i") {
        Dedup.releaseIndexes(spark); Dedup.primeIndexes(spark, dir, idx)
        Graph.degreeHistogram(spark, dir).count()
      }
    }
    (1 to 3).foreach { i =>
      t(s"q_graph_pagerank (9-file rewrite) rep$i") {
        Dedup.releaseIndexes(spark); Dedup.primeIndexes(spark, dir, idx)
        Graph.pagerank(spark, dir).count()
      }
    }
    // variant D: one beefy file (the 128MB-target rule at this SF)
    val rows1 = spark.read.parquet(flat).drop("batch_id").coalesce(1)
    rows1.write.mode("overwrite").parquet(s"$idx/.tmp-flat1")
    fs.delete(new org.apache.hadoop.fs.Path(flat), true)
    spark.read.parquet(s"$idx/.tmp-flat1").coalesce(1)
      .write.mode("overwrite").parquet(s"$flat/batch_id=base")
    inventory()
    (1 to 3).foreach { i =>
      t(s"q_graph_degree (1-file rewrite) rep$i") {
        Dedup.releaseIndexes(spark); Dedup.primeIndexes(spark, dir, idx)
        Graph.degreeHistogram(spark, dir).count()
      }
    }
    (1 to 3).foreach { i =>
      t(s"q_graph_pagerank (1-file rewrite) rep$i") {
        Dedup.releaseIndexes(spark); Dedup.primeIndexes(spark, dir, idx)
        Graph.pagerank(spark, dir).count()
      }
    }
    spark.stop()
  }
}
