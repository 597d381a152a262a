package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable

/** Diagnostic utility: attribute the serving-time CPU of the
  * pair-family queries job by job. The round-12 bench recorded
  * q_dedup_containment at 13.6× its CPU floor (1.86 vs 0.14 CPU-s)
  * with the whole pair family moving together — this probe reproduces
  * the bench's exact serving flow (writeIndexes → releaseIndexes →
  * primeIndexes → query, with a release+re-prime between samples) and
  * prints every Spark job that executes inside each query's timing
  * window with its stage-summed executor CPU, so a derived-state
  * rebuild billed to a serving query is visible by name instead of
  * inferred from a total.
  *
  * sbt "runMain graft.operators.PairServeProbe /root/testdata/sf0.1"
  */
object PairServeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val idx = if (args.length > 1) args(1)
              else java.nio.file.Files.createTempDirectory("graft_pairprobe_idx").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job-level CPU attribution: stage CPU rolls up to the owning job
    case class JobRec(id: Int, desc: String, var cpuNs: Long, var tasks: Int,
                      stages: mutable.ListBuffer[String])
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val tasksStarted = new AtomicLong(0L); val tasksEnded = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs(js.jobId) = JobRec(js.jobId, desc, 0L, 0, mutable.ListBuffer.empty)
        js.stageInfos.foreach(si => stageToJob(si.stageId) = js.jobId)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val si = sc.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.stages += s"${si.name.takeWhile(_ != '\n').take(60)}(${si.numTasks}t)"
        }
      }
      override def onTaskStart(ts: SparkListenerTaskStart): Unit =
        tasksStarted.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasksEnded.incrementAndGet()
        val m = te.taskMetrics
        if (m != null) jobs.synchronized {
          stageToJob.get(te.stageId).flatMap(jobs.get).foreach { j =>
            j.cpuNs += m.executorCpuTime; j.tasks += 1
          }
        }
      }
    })
    def drain(): Unit = {
      val deadline = System.nanoTime() + 2000000000L
      while (tasksStarted.get() != tasksEnded.get() && System.nanoTime() < deadline)
        Thread.sleep(5)
    }

    spark.range(1 << 20).selectExpr("sum(id)").count() // neutral warmup

    // Transfer experiment: does a SYNTHETIC parquet scan warm the same
    // runtime paths (vectorized reader, snappy, TakeOrdered heap) the
    // pair-artifact scan uses? If yes, rep1 of containment below lands
    // near steady state and the bench can warm neutrally.
    if (sys.env.get("PAIRPROBE_SCANWARM").contains("1")) {
      val wdir = java.nio.file.Files.createTempDirectory("pairprobe_warm").toString
      spark.range(1000000).selectExpr("id a", "id * 7 % 1001 b",
        "cast(id % 97 as long) c", "cast(id % 89 as long) d",
        "cast(id % 83 as long) e", "cast(id % 7 as double) / 7.0 j")
        .repartition(16).write.mode("overwrite").parquet(wdir)
      val wdf = spark.read.parquet(wdir)
      (1 to 10).foreach { _ =>
        wdf.withColumn("g", org.apache.spark.sql.functions.col("j") - org.apache.spark.sql.functions.col("c") / 100.0)
          .orderBy(org.apache.spark.sql.functions.col("g").desc).limit(20).count()
      }
      println("[pairprobe] synthetic scan warmup done")
    }

    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/jaccardPairs.parquet"))) {
      println(s"[pairprobe] building index artifacts at $idx")
      Dedup.writeIndexes(spark, dir, idx)
    }
    def reprime(): Unit = { Dedup.releaseIndexes(spark); Dedup.primeIndexes(spark, dir, idx) }
    reprime()

    val suspects = Seq("q_dedup_containment", "q_dedup_incremental",
      "q_dedup_jaccard", "q_source_overlap", "q_corpus_clean", "q_name_match")
    def timeOne(q: String, tag: String): Unit = {
      drain()
      val mark = jobs.synchronized { jobs.keys.toSet }
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      val window = jobs.synchronized {
        jobs.values.filterNot(j => mark(j.id)).toList
      }
      val cpu = window.map(_.cpuNs).sum / 1e9
      println(f"[pairprobe] $q%-24s $tag%-10s wall=$wall%6.3f s cpu=$cpu%6.3f s jobs=${window.size} ($n rows)")
      window.sortBy(-_.cpuNs).take(8).foreach { j =>
        println(f"[pairprobe]     job${j.id}%-5d cpu=${j.cpuNs / 1e9}%7.3f s tasks=${j.tasks}%4d  ${j.desc.take(90)}")
        j.stages.foreach(s => println(s"[pairprobe]         stage: $s"))
      }
    }
    suspects.foreach { q =>
      (1 to 2).foreach { rep => if (rep > 1) reprime(); timeOne(q, s"primed$rep") }
    }
    // JIT-decay check: the same primed serving repeated — if CPU keeps
    // falling across reps, the bench's recorded floors come from
    // fully-tiered JIT late in a long run, and a "regression" against
    // them is warmup variance, not engine change.
    (3 to 10).foreach { rep => reprime(); timeOne("q_dedup_containment", s"primed$rep") }
    // Counter-hypothesis check: serve the same queries from the
    // IN-SESSION checkpointed pair table (MEMORY_AND_DISK_SER blocks)
    // instead of the parquet artifact — if the recorded CPU floors only
    // occur in this state, the "regression" is two different serving
    // states sharing one floor, not an engine change.
    Dedup.releaseIndexes(spark)
    Dedup.jaccardPairTable(spark, dir).count() // build in-session, untimed
    suspects.take(4).foreach { q => timeOne(q, "insession") }
    spark.stop()
  }
}
