package graft.operators

import org.apache.spark.sql.functions._

/** Dev probe (r19): measured candidate-volume growth curves for the
  * three text near-dup families at 1×/10×/100× synthetic corpus tiers
  * — the ZOrderScaleProbe recipe applied to dedup. The claim under
  * test is "budget-bounded by construction": every bucket join is
  * df-capped with star-graph fallback, so candidate volume must grow
  * sub-quadratically in corpus size even on ADVERSARIAL input. The
  * tier generator makes each base document a template copied `mult`
  * times with one appended token (true near-dup clusters: shingle /
  * band / chunk df grows ×mult, blowing through the floors exactly as
  * boilerplate web data would), so the caps carry the load — a probe
  * with disjoint replicas would never stress them.
  *
  * Per tier it records, for jaccard (inverted shingle index), MinHash
  * LSH banding, and SimHash chunk pigeonhole: emitted candidate-pair
  * rows, build wall, and attributed task CPU. PLANS.md quotes the
  * table; sub-quadratic = candidates grow ≲ ×tier, never ×tier².
  *
  * sbt "runMain graft.operators.DedupScaleProbe /root/testdata/sf0.1 1,10,100"
  */
object DedupScaleProbe {
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
    def measured(tag: String)(f: => Long): Unit = {
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      val n = f
      Thread.sleep(300)
      println(f"[dsp] $tag%-40s cands=$n%12d  wall ${(System.nanoTime() - t0) / 1e9}%8.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%8.2f s")
    }

    // JIT warm
    spark.range(1 << 22).selectExpr("sum(id)").collect()

    val base = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = base.count()
    tiers.foreach { mult =>
      val dir =
        if (mult == 1) src
        else {
          val d = java.nio.file.Files.createTempDirectory(s"graft_dsp_${mult}x").toString
          val rep = spark.range(mult).select(col("id").as("r"))
          base.crossJoin(rep)
            .select((col("doc_id") + col("r") * nDocs).as("doc_id"),
              concat(col("text"), lit(" rep"), col("r").cast("string")).as("text"),
              col("lang"), col("source"))
            .withColumn("n_chars", length(col("text")).cast("long"))
            .write.mode("overwrite").parquet(s"$d/documents.parquet")
          d
        }
      println(s"[dsp] === tier ${mult}x (${mult * nDocs} docs) ===")
      // count the CANDIDATE tables, not the top-20 presentation
      // queries — the volume the caps exist to bound
      Dedup.releaseIndexes(spark)
      measured(s"${mult}x jaccard pair table") {
        Dedup.jaccardPairTable(spark, dir).count()
      }
      Dedup.releaseIndexes(spark)
      measured(s"${mult}x minhash band candidates") {
        Dedup.minhashCandidates(Dedup.minhashSignatures(spark, dir),
          bandRows = 2, Dedup.bandStarCap(spark, dir)).count()
      }
      Dedup.releaseIndexes(spark)
      measured(s"${mult}x simhash chunk candidates") {
        val docs = Dedup.simhashDocs(spark, dir)
        val chunks = docs.select(col("doc_id"),
          posexplode(array((0 until 4).map(j =>
            substring(col("bitstr"), j * 16 + 1, 16)): _*))
            .as(Seq("chunk_idx", "chunk")))
        Dedup.starCappedPairs(
          chunks.select(col("doc_id").as("id"), col("chunk_idx"), col("chunk")),
          Seq("chunk_idx", "chunk"), Dedup.chunkStarCap(spark, dir)).count()
      }
      Dedup.releaseIndexes(spark)
    }
    spark.stop()
  }
}
