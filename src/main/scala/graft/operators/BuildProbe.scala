package graft.operators

import org.apache.spark.sql.SparkSession

/** Diagnostic utility: per-stage cold-build timings for the shingle
  * index family (docShingles → shingleIndex → jaccardPairTable),
  * releasing the session cache between reps. Used to separate engine
  * cost from host-level stall windows when a bench sample spikes
  * (observed on this host: identical cold builds ranging 0.9–8 s with
  * flat GC — hypervisor scheduling noise, mitigated in Bench by the
  * outlier re-run). */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").count()
    (1 to 5).foreach { i =>
      Dedup.releaseIndexes(spark)
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] rep$i $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      }
      t("docShingles") { Dedup.docShingles(spark, dir).count() }
      t("shingleIndex") { Dedup.shingleIndex(spark, dir).count() }
      t("pairTable") { Dedup.jaccardPairTable(spark, dir).count() }
    }
    spark.stop()
  }
}

/** Diagnostic utility: the maintained-artifact posture measured — run
  * the index job once (writeIndexes), then time the index-backed
  * queries served from the parquet artifacts (primeIndexes) instead of
  * session rebuilds. The at-scale shape: an analysis session against a
  * 100 TB corpus primes artifacts a maintenance job keeps current; no
  * query pays the build, and nothing occupies the block manager.
  *
  * sbt "runMain graft.operators.PrimeProbe /tmp/corpus10x /tmp/corpus10x_idx"
  */
object PrimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val idx = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prime] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
    }
    // third arg "skipBuild" reuses already-written artifacts — re-time
    // the primed path without paying the index job again
    if (!(args.length > 2 && args(2) == "skipBuild"))
      t("writeIndexes(job)") { Dedup.writeIndexes(spark, dir, idx); 0L }
    Dedup.releaseIndexes(spark)
    // drop the in-process fitted-quantizer cache too, so the primed
    // IVF timings below include the artifact load, not a cache hit
    SimilarityIvf.clearFitCache()
    Dedup.primeIndexes(spark, dir, idx)
    Seq("q_corpus_clean", "q_dedup_jaccard", "q_dedup_canonical",
      "q_dedup_incremental", "q_dedup_minhash", "q_knn_lsh",
      "q_knn_ivf", "q_knn_ivf_fit").foreach { q =>
      t(q) { graft.SparkEntry.queries(q)(spark, dir).count() }
    }
    spark.stop()
  }
}

/** Diagnostic utility: the per-batch ingest append measured — the
  * operational complement of PrimeProbe. Against an already-written
  * index (a copy, since the append mutates it) and a batch-augmented
  * corpus dir, times (1) `appendIndexes(rebuildPairs = false)` — the
  * cheap per-batch path an ingest pipeline runs, (2) the deferred
  * `rebuildPairTable` an async maintenance job runs on its own
  * schedule, and (3) a primed index-backed query after each step, to
  * show the updated artifacts serve immediately. Quantifies the
  * deferral design: the batch append must cost batch-sized work, with
  * the corpus-global pair rebuild isolated in step 2.
  *
  * sbt "runMain graft.operators.AppendProbe /tmp/graft_sf1_aug /tmp/probe_idx_aug 95000000"
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val dir = args(0)
    val idx = args(1)
    val lo = args(2).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[append] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
    }
    SimilarityIvf.clearFitCache()
    t("primeIndexes(pre)") { Dedup.primeIndexes(spark, dir, idx); 0L }
    t("appendIndexes(noPairs)") {
      Dedup.appendIndexes(spark, dir, idx,
        col("doc_id") >= lo, Some(col("vec_id") >= lo), rebuildPairs = false)
      0L
    }
    t("q_dedup_minhash(post)") { graft.SparkEntry.queries("q_dedup_minhash")(spark, dir).count() }
    t("q_knn_ivf_fit(post)") { graft.SparkEntry.queries("q_knn_ivf_fit")(spark, dir).count() }
    t("rebuildPairTable(deferred)") { Dedup.rebuildPairTable(spark, dir, idx); 0L }
    t("q_dedup_jaccard(post)") { graft.SparkEntry.queries("q_dedup_jaccard")(spark, dir).count() }
    spark.stop()
  }
}
