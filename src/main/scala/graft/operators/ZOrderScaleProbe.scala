package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Dev probe: the re-planned z-order layout at the 10× and 100× tiers
  * (synthetic orders replicas, key-shifted) — the claim under test is
  * that the r18 blockCumsum-rank plan scales where the single-reducer
  * NTILE could not: no full-table single-partition stage, wall
  * tracking data volume / parallelism rather than one task.
  *
  * sbt "runMain graft.operators.ZOrderScaleProbe /root/testdata/sf0.1"
  */
object ZOrderScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      val n = f
      Thread.sleep(300)
      println(f"[zsp] $name%-34s ${(System.nanoTime() - t0) / 1e9 - 0.3}%8.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%7.2f s  ($n)")
    }
    val o = spark.read.parquet(s"$src/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val maxO = o.agg(max("o_orderkey")).head.getLong(0) + 1
    Seq(10, 100).foreach { mult =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_z${mult}x").toString
      val rep = spark.range(mult).select(col("id").as("r"))
      t(s"generate ${mult}x orders") {
        // key-shifted replicas keep o_orderkey unique (the rank
        // tie-break) and spread o_custkey so the quantizer grid stays
        // densely populated
        o.crossJoin(rep)
          .select((col("o_orderkey") + col("r") * maxO).as("o_orderkey"),
            (col("o_custkey") * mult + col("r")).as("o_custkey"),
            col("o_orderdate"))
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        spark.read.parquet(s"$dir/orders.parquet").count()
      }
      (1 to 2).foreach { i =>
        t(s"zorderLayout ${mult}x rep$i") {
          ZOrder.zorderLayout(spark, dir).count()
        }
      }
      // scale-safety invariant: no unpartitioned window over the fact
      // rows — the only empty-partitionSpec window consumes the ≤4096
      // block totals
      import org.apache.spark.sql.execution.window.WindowExec
      val unpart = ZOrder.zorderLayout(spark, dir)
        .queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.size
      println(s"[zsp] ${mult}x unpartitioned windows: $unpart (block-prefix only)")
    }
    spark.stop()
  }
}
