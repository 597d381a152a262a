package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Dev probe (r20): A/B harness for the slim pair-exchange reshape of
  * jaccardPairPlan (run once on the old tree, once on the new; compare
  * CPU and the exact checksums). Primes the upstream shingle artifacts
  * first so the timed region is the pair build alone.
  *
  * sbt "runMain graft.operators.PairSlimR20Probe /root/testdata/sf0.1"
  */
object PairSlimR20Probe {
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
    // prime the upstream artifacts OUTSIDE the timed region
    Dedup.shingleIndex(spark, dir).count()
    def timed(name: String)(f: => Unit): Unit = {
      Thread.sleep(300)
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      f
      Thread.sleep(300)
      println(f"[psp] $name%-18s wall ${(System.nanoTime() - t0) / 1e9 - 0.3}%6.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%6.2f s")
    }
    (1 to 4).foreach { rep =>
      timed(s"rep$rep pairPlan") {
        Dedup.jaccardPairPlan(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // exact checksums: integer sums are order-proof; jaccard is checked
    // per-row at the oracle, not here
    import org.apache.spark.sql.functions._
    val s = Dedup.jaccardPairPlan(spark, dir)
      .agg(count(lit(1)), sum(col("n_common")), sum(col("n_a") + col("n_b")),
        sum(col("id_a") * 31 + col("id_b")))
      .first()
    println(s"[psp] checksum $s")
    Dedup.jaccardPairPlan(spark, dir).explain("formatted")
    spark.stop()
  }
}
