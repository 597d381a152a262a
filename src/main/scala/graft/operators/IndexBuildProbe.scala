package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Dev probe: per-ARTIFACT CPU attribution of the full index job
  * (writeIndexes), N cold reps — the fast feedback loop for cutting
  * absolute build cost. Mirrors Bench's graft-index job-description
  * listener so the numbers are comparable with the committed
  * attribution tables in PLANS.md.
  *
  * sbt "runMain graft.operators.IndexBuildProbe /root/testdata/sf0.1 3"
  */
object IndexBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cpuNs = new AtomicLong(0L)
    val jobDesc = new java.util.concurrent.ConcurrentHashMap[Integer, String]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Integer, Integer]()
    val descCpuNs = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        if (d.startsWith("graft-index:")) {
          jobDesc.put(js.jobId, d.stripPrefix("graft-index:"))
          js.stageInfos.foreach(si => stageJob.put(si.stageId, js.jobId))
        }
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          cpuNs.addAndGet(m.executorCpuTime)
          val j = stageJob.get(te.stageId)
          if (j != null) {
            val d = jobDesc.get(j)
            if (d != null) descCpuNs
              .computeIfAbsent(d, _ => new AtomicLong(0L))
              .addAndGet(m.executorCpuTime)
          }
        }
      }
    })

    spark.range(1 << 20).selectExpr("sum(id)").count()
    (1 to reps).foreach { i =>
      val idx = java.nio.file.Files.createTempDirectory("graft_ibp").toString
      Dedup.releaseIndexes(spark)
      Thread.sleep(500) // let listener drain between reps
      descCpuNs.clear(); jobDesc.clear(); stageJob.clear()
      val c0 = cpuNs.get()
      val t0 = System.nanoTime()
      Dedup.writeIndexes(spark, dir, idx)
      Thread.sleep(1000)
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (cpuNs.get() - c0) / 1e9
      import scala.jdk.CollectionConverters._
      println(f"[ibp] rep$i wall $wall%7.2f s  cpu $cpu%7.2f s")
      descCpuNs.asScala.toSeq.sortBy(-_._2.get()).foreach { case (n, v) =>
        println(f"[ibp]   $n%-18s ${v.get() / 1e9}%7.2f s")
      }
      // clean up temp artifacts
      try {
        import scala.jdk.StreamConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(idx)).toScala(Seq)
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
