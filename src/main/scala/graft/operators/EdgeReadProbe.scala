package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Dev probe: read-side cost of the graphEdgeFracs artifact under the
  * r18 single-pass layout (flat artifact = copied bucketed files) vs a
  * plain rewrite of the same rows — the graph family's bench CPU
  * tripled after the layout change and the scans are the suspect.
  *
  * sbt "runMain graft.operators.EdgeReadProbe /root/testdata/sf0.1"
  */
object EdgeReadProbe {
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
      println(f"[erp] $name%-36s ${(System.nanoTime() - t0) / 1e9 - 0.3}%6.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%6.2f s  ($n)")
    }
    val idx = java.nio.file.Files.createTempDirectory("graft_erp").toString
    println("[erp] building edge artifacts (single-pass writer)...")
    Graph.writeEdgeArtifacts(spark, dir, idx)
    Dedup.releaseIndexes(spark)
    val flat = s"$idx/graphEdgeFracs.parquet"
    // file inventory
    val fs = new org.apache.hadoop.fs.Path(flat)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(flat), true)
    var nf = 0; var bytes = 0L
    while (it.hasNext) { val s = it.next(); if (s.getPath.getName.endsWith(".parquet")) { nf += 1; bytes += s.getLen } }
    println(s"[erp] copied-bucketed flat artifact: $nf files, ${bytes / 1024 / 1024} MB")
    // plain rewrite of the same rows for comparison
    val plain = s"$idx/plainEdgeFracs.parquet"
    spark.read.parquet(flat).drop("batch_id")
      .write.mode("overwrite").parquet(plain)
    val it2 = fs.listFiles(new org.apache.hadoop.fs.Path(plain), true)
    var nf2 = 0; var bytes2 = 0L
    while (it2.hasNext) { val s = it2.next(); if (s.getPath.getName.endsWith(".parquet")) { nf2 += 1; bytes2 += s.getLen } }
    println(s"[erp] plain rewrite: $nf2 files, ${bytes2 / 1024 / 1024} MB")
    (1 to 2).foreach { rep =>
      println(s"[erp] === rep $rep ===")
      t("copied-bucketed: scan+agg") {
        spark.read.parquet(flat).drop("batch_id")
          .agg(sum(col("w")), sum(col("frac"))).collect()(0)
      }
      t("plain rewrite: scan+agg") {
        spark.read.parquet(plain)
          .agg(sum(col("w")), sum(col("frac"))).collect()(0)
      }
      t("copied-bucketed: 10 distinct-node aggs") {
        (1 to 10).map(_ => spark.read.parquet(flat).drop("batch_id")
          .select(col("src")).distinct().count()).last
      }
      t("plain rewrite: 10 distinct-node aggs") {
        (1 to 10).map(_ => spark.read.parquet(plain)
          .select(col("src")).distinct().count()).last
      }
    }
    spark.stop()
  }
}
