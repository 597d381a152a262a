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
