package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Dev probe (r20): the measurement record behind REJECTING the
  * explode-first single-exchange reshape of edgeFracsPlan.
  *
  * The reshape (explode raw join rows, one slim hash(src) exchange,
  * agg + window riding it) cuts shuffled bytes ~2× and removes a
  * near-no-op partial aggregation — and still LOST in the writer:
  * writeEdgeArtifacts measured 7.5-10.2 CPU-s (coalescible variant) /
  * 17-29 (pinned repartition(n, src)) vs 5.5-8.6 for the two-exchange
  * production shape at equal weather. Mechanism, isolated below: the
  * post-exchange stage pays ~0.35 CPU-s PER TASK on its first run in
  * a session (fresh-session codegen/JIT of the fused region — total
  * CPU ∝ task count at fixed rows: ~12.5 CPU at np=32, ~3.8 at np=8,
  * ~1.8 at np=2), and the build runs on a fresh cloned session every
  * time, so a shape that fuses MORE operators into one wider stage
  * pays more first-run interpretation than its exchange saving. The
  * two-exchange shape lets AQE coalesce both exchanges to ~6-10 tasks
  * and splits the codegen into smaller, separately-warmed regions.
  *
  * sbt "runMain graft.operators.EdgeStageR20Probe /root/testdata/sf0.1"
  */
object EdgeStageR20Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
      println(f"[esp] $name%-28s wall ${(System.nanoTime() - t0) / 1e9}%6.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    spark.range(1 << 22).selectExpr("sum(id)").collect()

    // the rejected single-exchange shape, at three pinned partition
    // counts — each on a FRESH session, forcing the first-run path the
    // index build actually takes. Total CPU tracks the task count.
    def halfOf(s: org.apache.spark.sql.SparkSession) = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select(explode(array(
        struct((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst")),
        struct((col("l_suppkey") * 2 + 1).as("src"), (col("o_custkey") * 2).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    Seq(32, 8, 2).foreach { np =>
      (1 to 2).foreach { rep =>
        val ws = spark.newSession()
        timed(s"rep$rep fresh singleExch np=$np") {
          noop(halfOf(ws).repartition(np, col("src"))
            .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w")))
        }
      }
    }
    // the production two-exchange plan on the same fresh-session terms
    (1 to 2).foreach { rep =>
      val ws = spark.newSession()
      timed(s"rep$rep fresh production") {
        val (plan, _) = Graph.edgeFracsPlan(ws, dir)
        noop(plan)
      }
    }
    spark.stop()
  }
}
