package graft.operators

import org.apache.spark.sql.functions._

/** Dev probe (r19): size + cost split of jaccardPairPlan's two
  * branches — is the star branch's full-corpus double array-hash
  * (transform(xxhash64) below the join on both sides) worth a
  * prefilter, or is it noise next to the small-branch pair agg?
  *
  * sbt "runMain graft.operators.StarBranchProbe /root/testdata/sf0.1"
  */
object StarBranchProbe {
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
    spark.range(1 << 20).selectExpr("sum(id)").count()
    def t(name: String)(f: => Any): Unit = {
      Thread.sleep(300)
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      val n = f
      Thread.sleep(300)
      println(f"[sbp] $name%-36s ${(System.nanoTime() - t0) / 1e9 - 0.3}%6.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%6.2f s  ($n)")
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))
    val cap = Dedup.shingleStarCap(spark, dir)
    println(s"[sbp] cap=$cap")
    val idx = Dedup.shingleIndex(spark, dir)
      .withColumn("shingle", xxhash64(col("shingle")))
      .withColumn("df", count(lit(1)).over(w))
      .withColumn("min_id", min(col("doc_id")).over(w))
    t("corpus stats") {
      val r = Dedup.docShingles(spark, dir)
        .agg(count(lit(1)), sum(size(col("sh")))).first()
      s"docs=${r.getLong(0)} shingles=${r.getLong(1)}"
    }
    t("starCands count") {
      idx.filter(col("df") > cap).filter(col("doc_id") =!= col("min_id"))
        .select(col("min_id").as("id_a"), col("doc_id").as("id_b"))
        .distinct().count()
    }
    t("star doc ids") {
      val sc = idx.filter(col("df") > cap).filter(col("doc_id") =!= col("min_id"))
        .select(col("min_id").as("id_a"), col("doc_id").as("id_b")).distinct()
      sc.select(col("id_a").as("d")).union(sc.select(col("id_b").as("d")))
        .distinct().count()
    }
    (1 to 3).foreach { i =>
      t(s"full-corpus double hash rep$i") {
        val sh = Dedup.docShingles(spark, dir)
          .withColumn("sh", transform(col("sh"), s => xxhash64(s)))
        sh.agg(sum(size(col("sh")))).first()
        sh.agg(sum(size(col("sh")))).first()  // both shA and shB branches
        1
      }
    }
    (1 to 3).foreach { i =>
      t(s"small-branch pair rows rep$i") {
        val small = idx.filter(col("df") <= cap)
        val a = small.select(col("doc_id").as("id_a"), col("shingle"))
        val b = small.select(col("doc_id").as("id_b"), col("shingle"))
        a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b")).count()
      }
    }
    spark.stop()
  }
}
