package graft.operators

import org.apache.spark.sql.functions._

/** Dev probe (r20, VERDICT item 8): growth curves for the five
  * largest-shuffle queries of the latency-bound sub-second tail — the
  * set the sf0.1 bench cannot see scale behavior for (their 32-core
  * walls are stage-scheduling, not data). The ZOrderScaleProbe recipe:
  * key-shifted synthetic replicas of the query's fact table at
  * 1×/10×/100×, wall + attributed task CPU per tier. Replicated
  * documents get a per-TOKEN replica suffix so every term and every
  * 8-gram is distinct across replicas — df distributions stay at
  * their base shape while volume grows ×tier (an earlier draft that
  * appended ONE token per doc made every gram's df grow ×tier
  * instead, and at 100× the decontamination MaxGramDf cap correctly
  * dropped the whole stream — the designed boilerplate-flood
  * degradation DedupScaleProbe already covers, rows 27/270/0 — which
  * measures the caps, not volume scaling).
  *
  * Sub-quadratic = CPU grows ≲ ×tier, never ×tier².
  *
  * sbt "runMain graft.operators.TailScaleR20Probe /root/testdata/sf0.1 1,10,100"
  */
object TailScaleR20Probe {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val tiers = (if (args.length > 1) args(1) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
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
      println(f"[tsp] $name%-36s wall ${(System.nanoTime() - t0) / 1e9 - 0.3}%7.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%7.2f s  ($n)")
    }

    val qs = graft.SparkEntry.queries
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    val events = spark.read.parquet(s"$src/events.parquet")
    val nEv = events.count()
    val maxUser = events.agg(max("user_id")).head.getLong(0) + 1

    tiers.foreach { mult =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_tail${mult}x").toString
      val rep = spark.range(mult).select(col("id").as("r"))
      t(s"${mult}x generate documents (${mult * nDocs})") {
        docs.crossJoin(rep)
          .select((col("doc_id") + col("r") * nDocs).as("doc_id"),
            array_join(transform(split(col("text"), "\\s+"),
              t => concat(t, lit("_"), col("r").cast("string"))), " ").as("text"),
            col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        spark.read.parquet(s"$dir/documents.parquet").count()
      }
      t(s"${mult}x generate events (${mult * nEv})") {
        events.crossJoin(rep)
          .select((col("event_id") + col("r") * (nEv + 1)).as("event_id"),
            col("ts"),
            (col("user_id") + col("r") * maxUser).as("user_id"),
            col("event_type"), col("value"), col("props"))
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
        spark.read.parquet(s"$dir/events.parquet").count()
      }
      Seq("q_decontaminate", "q_text_tfidf", "q_text_bm25",
          "q_events_top_sessions", "q_events_transitions").foreach { q =>
        (1 to 2).foreach { i =>
          t(s"${mult}x $q rep$i") { qs(q)(spark, dir).collect().length }
        }
      }
      Dedup.releaseIndexes(spark)
      // reclaim the tier's synthetic tables
      try {
        import scala.jdk.StreamConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).toScala(Seq)
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
