package graft.operators

import org.apache.spark.sql.functions._

/** Dev probe: the composed e2e curation pipeline at a replicated
  * document scale — the wall-clock evidence that the ONE-query
  * lineage composition (q_pipeline_e2e) survives a corpus two orders
  * past the driver SFs. Replicas carry a per-replica suffix token so
  * exact dedup does NOT trivially collapse them; the suffix makes
  * every replica group a ~100-member near-dup cluster instead, which
  * drives the pair stage through its star-capped path (shingle df ≈
  * group size > MaxBandDf) — the adversarial shape for candidate
  * generation at scale.
  *
  * sbt "runMain graft.operators.PipelineScaleProbe /root/testdata/sf0.1 100"
  */
object PipelineScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe_scale").toString
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    val rep = spark.range(mult).select(col("id").as("r"))
    t(s"generate ${mult}x corpus (${mult * nDocs} docs)") {
      docs.crossJoin(rep)
        .select((col("doc_id") + col("r") * nDocs).as("doc_id"),
          concat(col("text"), lit(" rep"), col("r")).as("text"),
          col("lang"), col("source"),
          // " rep" + the replica digits — exact, so n_chars consumers
          // (card sums, PPS weights) stay consistent with the text
          (col("n_chars") + lit(4) +
            length(col("r").cast("string"))).as("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    val out = t(s"pipelineE2e end-to-end (${mult * nDocs} docs)") {
      Pipeline.pipelineE2e(spark, dir).collect()
    }
    out.foreach(r => println(s"[probe] ${r.mkString(" | ")}"))
    // the incremental window re-run against the WARM maintained stage
    // sets: the marginal cost of accounting one ingest batch once the
    // corpus-global verdicts exist — the production cadence (full run
    // nightly, delta accounting per batch)
    val lo = nDocs * (mult / 2)
    val hi = lo + nDocs / 10
    val inc = t(s"pipelineE2eSince warm delta ($lo, $hi] (~${nDocs / 10} docs)") {
      Pipeline.pipelineE2eSince(spark, dir, lo, hi).collect()
    }
    inc.foreach(r => println(s"[probe] delta ${r.mkString(" | ")}"))
    // and COLD: a fresh session that primes nothing and derives the
    // chain once — the upper bound a standalone delta job pays
    Dedup.releaseIndexes(spark)
    val inc2 = t(s"pipelineE2eSince cold delta ($lo, $hi]") {
      Pipeline.pipelineE2eSince(spark, dir, lo, hi).collect()
    }
    require(inc.map(_.mkString("|")).toSeq == inc2.map(_.mkString("|")).toSeq,
      "cold delta diverged from warm delta")
    spark.stop()
  }
}
