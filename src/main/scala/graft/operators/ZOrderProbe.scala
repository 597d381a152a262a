package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Dev probe: stage-by-stage dissection of the r18 distributed
  * z-order plan (blockCumsum rank + closed-form NTILE) — where do
  * ~2.5 s go for a 150k-row layout whose pre-r18 single-reducer plan
  * ran 0.4 s?
  *
  * sbt "runMain graft.operators.ZOrderProbe /root/testdata/sf0.1"
  */
object ZOrderProbe {
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
      println(f"[zp] $name%-32s ${(System.nanoTime() - t0) / 1e9 - 0.3}%6.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%6.2f s  ($n)")
    }
    import graft.sources.Tables
    (1 to 2).foreach { rep =>
      println(s"[zp] === rep $rep ===")
      val o = Tables.orders(spark, dir)
        .selectExpr("o_orderkey", "CAST(o_custkey AS BIGINT) AS ck",
          "CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT) AS od")
      t("orders narrow scan") { o.count() }
      val ext = o.agg(min("ck").as("ck_min"), max("ck").as("ck_max"),
        min("od").as("od_min"), max("od").as("od_max"))
      val z = o.crossJoin(broadcast(ext))
        .selectExpr("o_orderkey", "ck", "od",
          "(((ck - ck_min) * 65536) div (ck_max - ck_min + 1)) AS qx",
          "(((od - od_min) * 65536) div (od_max - od_min + 1)) AS qy")
        .selectExpr("o_orderkey", "ck", "od",
          s"${ZOrder.mortonExpr("qx", "qy", (a, b) => s"($a div $b)")} AS z")
      t("z projection (morton)") { z.count() }
      val ranked = Curation.blockCumsum(z, expr("z DIV 1048576"),
        Seq(col("z"), col("o_orderkey")), lit(1L))
      t("blockCumsum rank") { ranked.count() }
      // fine-grained: which half of blockCumsum costs?
      val withBlock = z.withColumn("_blk", expr("z DIV 1048576"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_blk")).orderBy(col("z"), col("o_orderkey"))
        .rowsBetween(Long.MinValue, 0)
      t("  within-block window only") {
        withBlock.withColumn("_within", sum(lit(1L)).over(win)).count()
      }
      val blockTotals = withBlock.groupBy(col("_blk"))
        .agg(sum(lit(1L)).as("_blk_total"))
      t("  block totals agg only") { blockTotals.count() }
      val prefixed = blockTotals.withColumn("_blk_prefix",
        coalesce(sum(col("_blk_total")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("_blk"))
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
        .select(col("_blk"), col("_blk_prefix"))
      t("  block prefix window only") { prefixed.count() }
      t("  join (window x prefix)") {
        withBlock.withColumn("_within", sum(lit(1L)).over(win))
          .join(prefixed, Seq("_blk")).count()
      }
      if (rep == 2) {
        val j = withBlock.withColumn("_within", sum(lit(1L)).over(win))
          .join(prefixed, Seq("_blk"))
        j.count()
        println("[zp] === executed plan of the join ===")
        println(j.queryExecution.executedPlan.toString.take(6000))
      }
      t("full zorderLayout") { ZOrder.zorderLayout(spark, dir).count() }
      t("old NTILE formulation") {
        z.selectExpr("ck", "od",
          "CAST(NTILE(64) OVER (ORDER BY z, o_orderkey) AS BIGINT) AS file_id")
          .groupBy("file_id")
          .agg(count(lit(1)).as("n_rows"),
            min("ck").as("ck_lo"), max("ck").as("ck_hi"),
            min("od").as("od_lo"), max("od").as("od_hi"))
          .orderBy("file_id").count()
      }
    }
    spark.stop()
  }
}
