package graft

/** Dev utility: time one named query repeatedly and report WALL and
  * PROCESS CPU (utime+stime of the whole JVM from /proc/self/stat —
  * includes GC and Spark daemon threads, so it upper-bounds the bench
  * listener's task-CPU number). Separates "this query's CPU moved"
  * from "the suite context around it moved" when a regress-gate CPU
  * flag persists across samples with no code change on the query's
  * path.
  *
  * sbt "runMain graft.CpuProbe q_graph_pagerank /root/testdata/sf0.1 3"
  */
object CpuProbe {
  private def procCpuSec(): Double = {
    val stat = scala.io.Source.fromFile("/proc/self/stat").mkString.split(" ")
    // fields 14/15 (1-based) = utime/stime in clock ticks; Linux
    // USER_HZ is 100 on every supported platform here
    (stat(13).toDouble + stat(14).toDouble) / 100.0
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").count() // neutral warmup
    (1 to reps).foreach { i =>
      val c0 = procCpuSec()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[cpuprobe] $name rep$i wall ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        f"procCpu ${procCpuSec() - c0}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
