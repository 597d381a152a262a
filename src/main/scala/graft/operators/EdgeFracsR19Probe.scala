package graft.operators

import org.apache.spark.sql.functions._

/** Dev probe (r19): plan shape + CPU of the single-pass window-form
  * edgeFracs plan, and whether the bucketed write can ride the
  * window's exchange instead of adding its own repartition.
  *
  * sbt "runMain graft.operators.EdgeFracsR19Probe /root/testdata/sf0.1"
  */
object EdgeFracsR19Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = spark.sessionState.conf.numShufflePartitions
    val out = java.nio.file.Files.createTempDirectory("graft_efp").toString

    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) cpuNs.addAndGet(m.executorCpuTime)
      }
    })
    def timed(name: String)(f: => Unit): Unit = {
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      f
      Thread.sleep(300)
      println(f"[efp] $name%-28s wall ${(System.nanoTime() - t0) / 1e9}%6.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%6.2f s")
    }
    def files(p: String): Int = {
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(p))
        .count(_.getPath.getName.endsWith(".parquet"))
    }

    // warm JIT
    spark.range(1 << 22).selectExpr("sum(id)").collect()

    val wspark = spark.newSession()
    wspark.conf.set("spark.sql.adaptive.localShuffleReader.enabled", "false")

    (1 to 3).foreach { rep =>
      // A: window plan + explicit repartition (current writer shape)
      timed(s"rep$rep withRepartition") {
        spark.sql("DROP TABLE IF EXISTS efp_a")
        val (plan, _) = Graph.edgeFracsPlan(wspark, dir)
        plan.repartition(n, col("src"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(n, "src").sortBy("src")
          .option("path", s"$out/a_$rep").saveAsTable("efp_a")
      }
      println(s"[efp]   files A: ${files(s"$out/a_$rep")}")
      // B: window plan straight into the bucketed write
      timed(s"rep$rep noRepartition") {
        spark.sql("DROP TABLE IF EXISTS efp_b")
        val (plan, _) = Graph.edgeFracsPlan(wspark, dir)
        plan.write.mode("overwrite").format("parquet")
          .bucketBy(n, "src").sortBy("src")
          .option("path", s"$out/b_$rep").saveAsTable("efp_b")
      }
      println(s"[efp]   files B: ${files(s"$out/b_$rep")}")
    }
    // C: the full production writer (bucketed table + flat re-encode +
    // footer sizing + fingerprint) — the gap between this and B is the
    // flat-artifact stage the in-build attribution charges
    (1 to 3).foreach { rep =>
      val idx = java.nio.file.Files.createTempDirectory("graft_efp_full").toString
      timed(s"rep$rep writeEdgeArtifacts") {
        Graph.writeEdgeArtifacts(spark, dir, idx)
      }
      Dedup.memoDrop(spark, s"graphEdgeFracs|$dir")
      Dedup.memoDrop(spark, s"graphEdgesBySrc|$dir")
    }
    // D: the flat stage ALONE — decode the bucketed files, coalesce to
    // the consumer geometry, re-encode (what writeEdgeArtifacts pays on
    // top of the bucketed write)
    (1 to 3).foreach { rep =>
      timed(s"rep$rep flatStageOnly") {
        spark.read.parquet(s"$out/b_3").coalesce(9)
          .write.mode("overwrite").parquet(s"$out/flat_$rep")
      }
    }
    val (plan, _) = Graph.edgeFracsPlan(wspark, dir)
    println("=== explain: window plan, no repartition, bucketed write would see ===")
    plan.explain("formatted")
    spark.stop()
  }
}
