package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import java.util.concurrent.atomic.AtomicLong

/** Dev probe: stage-by-stage CPU dissection of the graphEdgeFracs /
  * graphEdgesBySrc build (the #2/#3 items of the index job's CPU
  * budget) — where do ~19 CPU-s go for a 600k-row join?
  *
  * sbt "runMain graft.operators.EdgeBuildProbe /root/testdata/sf0.1"
  */
object EdgeBuildProbe {
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
      println(f"[ebp] $name%-28s ${(System.nanoTime() - t0) / 1e9 - 0.3}%6.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%6.2f s  ($n)")
    }

    (1 to 2).foreach { rep =>
      println(s"[ebp] === rep $rep ===")
      val eb0 = Tables.orders(spark, dir)
        .join(Tables.lineitem(spark, dir),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .agg(count(lit(1)).as("w"))
      t("eb.count (join+agg once)") { eb0.count() }
      val eb = Dedup.checkpointSer(eb0.select(col("a"), col("b"), col("w")))
      t("eb checkpointSer") { eb.count() }
      val e = eb.select(col("a").as("src"), col("b").as("dst"), col("w"))
        .unionByName(eb.select(col("b").as("src"), col("a").as("dst"), col("w")))
      val ow = e.groupBy("src").agg(sum(col("w")).as("ow"))
      val fr = e.join(ow, "src")
        .select(col("src"), col("dst"), col("w"),
          (col("w").cast("double") / col("ow").cast("double")).as("frac"))
      t("fracs from ckpt eb (count)") { fr.count() }
      val frCk = Dedup.checkpointSer(fr)
      t("fracs checkpointSer") { frCk.count() }
      val out = java.nio.file.Files.createTempDirectory("ebp").toString
      t("plain parquet write") {
        frCk.write.mode("overwrite").parquet(s"$out/fr.parquet"); 0
      }
      t("bucketed write (bySrc)") {
        val n = spark.sessionState.conf.numShufflePartitions
        spark.sql("DROP TABLE IF EXISTS ebp_bysrc")
        frCk.repartition(n, col("src"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(n, "src").sortBy("src")
          .option("path", s"$out/bysrc")
          .saveAsTable("ebp_bysrc")
        0
      }
      // the CURRENT production path for comparison
      Dedup.memoDrop(spark, s"graphEdgeFracs|$dir")
      t("current edgeFracs (memoless)") { Graph.edgeFracs(spark, dir).count() }
      Dedup.releaseIndexes(spark)
    }
    spark.stop()
  }
}
