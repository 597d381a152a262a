package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time one named query repeatedly on a chosen sf dir —
  * separates plan/compile cost (first run) from steady-state execute
  * (later runs) when diagnosing a bench outlier.
  *
  * sbt "runMain graft.TimeQuery q_text_repetition /root/testdata/sf0.1 3"
  */
/** Dev utility: run a comma-separated list of queries in order in ONE
  * JVM/session (shared memo state, like a bench family) and print each
  * wall time — reproduces context-dependent slowdowns that single-query
  * timing hides.
  *
  * sbt "runMain graft.TimeQueries q_corpus_clean,q_dedup_minhash /root/testdata/sf0.1"
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[time] $name ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}

object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 4th arg "cold": release the session index cache between reps, so
    // every rep re-times the index BUILD (diagnoses build variance)
    // instead of rep1 build + warm reps.
    val cold = args.length > 3 && args(3) == "cold"
    spark.range(1 << 20).selectExpr("sum(id)").count() // neutral warmup
    (1 to reps).foreach { i =>
      if (cold) graft.operators.Dedup.releaseIndexes(spark)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[time] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
