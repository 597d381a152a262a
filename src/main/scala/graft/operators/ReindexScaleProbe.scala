package graft.operators

import org.apache.spark.sql.functions._

/** Dev probe: the frozen-geometry GROWTH hazard and its repair,
  * measured at the 100× tier — the case no fixed-corpus probe can show
  * (VERDICT r14). Builds a 200k-vector corpus whose LSH bucket
  * artifact is frozen at the h=8 geometry a ≤8192-vector build would
  * have chosen (what years of appends past the build produce), then:
  *
  *   1. times the one-time bucket build itself (the r15 fused kernel
  *      vs PLANS.md §16's 236 s composed-expression baseline);
  *   2. times the degraded 1000-query serving head on the stale
  *      geometry (expected: back toward the r13 scale-killer —
  *      occupancy ≈ 780/bucket at 200k/2^8);
  *   3. shows the drift monitor tripping (the new signal);
  *   4. runs the leased re-index verb;
  *   5. re-times serving on the restored geometry and audits recall@5
  *      against exact top-k before/after (the repair must not trade
  *      recall).
  *
  * sbt "runMain graft.operators.ReindexScaleProbe /root/testdata/sf0.1 100"
  */
object ReindexScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 100
    val batchN = 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-52s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_reindex_scale").toString
    val idx = java.nio.file.Files.createTempDirectory("graft_reindex_idx").toString
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nEmb = emb.count()
    val rep = spark.range(mult).select(col("id").as("r"))
    t(s"generate ${mult}x corpus (${mult * nEmb} vectors)") {
      emb.crossJoin(rep)
        .select((col("vec_id") + col("r") * nEmb).as("vec_id"),
          transform(col("embedding"),
            x => x + (col("r").cast("float") * lit(0.001f))).as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    val all = spark.read.parquet(s"$dir/embeddings.parquet")

    // the frozen artifact a grown corpus carries: embBase + h=8 buckets
    t("embBase artifact build") {
      Similarity.embBaseOf(all).write.mode("overwrite")
        .parquet(s"$idx/embBase.parquet/batch_id=base")
    }
    val base = spark.read.parquet(s"$idx/embBase.parquet").drop("batch_id")
    t(s"bucket artifact build, FUSED kernel, h=8, ${mult * nEmb} vectors") {
      Similarity.lshBucketsOf(base, 8).write.mode("overwrite")
        .parquet(s"$idx/lshBuckets.parquet/batch_id=base")
    }
    Dedup.primeIndexes(spark, dir, idx)

    // never-seen query batch (ServeScaleProbe recipe)
    all.filter(col("vec_id") < batchN)
      .select((col("vec_id") + lit(10000000L)).as("query_id"),
        transform(col("embedding"), x => x * lit(1.0001f) + lit(0.0005f))
          .as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/queryBatch.parquet")
    val qb = spark.read.parquet(s"$dir/queryBatch.parquet")

    def serveSample(tag: String): Unit = (1 to 2).foreach { i =>
      t(s"LSH serve $batchN queries, $tag, sample $i") {
        Similarity.annServeBatch(spark, dir, qb, k = 5, radius = 1).count()
      }
    }
    // exact ground truth for the recall audit (50 queries) — embBase
    // re-read per call: the reindex swap replaces the artifact's files
    // and a pinned pre-swap listing would throw FileNotFound
    val qSmall = qb.filter(col("query_id") < 10000050L)
    def exactTop5 = {
      val corpus = spark.read.parquet(s"$idx/embBase.parquet").drop("batch_id")
      val q = Similarity.embBaseOf(
        qSmall.select(col("query_id").as("vec_id"), col("embedding")))
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
      broadcast(q).join(corpus.select(col("vec_id").as("neighbor_id"),
          col("v"), col("nrm")))
        .withColumn("cos", graft.functions.ArrayDotProduct(col("qv"), col("v")) /
          (col("qn") * col("nrm")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("query_id", "neighbor_id")
    }
    def recallAt5(tag: String): Unit = {
      val ex = exactTop5.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Similarity.annServeBatch(spark, dir, qSmall, k = 5, radius = 1)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[probe] recall@5 $tag: ${(ex & got).size.toDouble / ex.size}%.3f " +
        s"(${(ex & got).size}/${ex.size})")
    }

    println("=== stale frozen geometry (h=8 at 200k: the silent-growth case) ===")
    serveSample("h=8 stale")
    t("drift monitor (lsh family)") {
      Reindex.geometryDrift(spark, dir, families = Set("lsh")).show(false)
    }
    recallAt5("h=8 stale")

    println("=== leased re-index verb ===")
    t("reindexArtifacts (embBase + lshBuckets present)") {
      Dedup.reindexArtifacts(spark, dir, idx)
    }

    println("=== restored geometry ===")
    t("drift monitor after reindex") {
      Reindex.geometryDrift(spark, dir, families = Set("lsh")).show(false)
    }
    serveSample("reindexed")
    recallAt5("reindexed")
    spark.stop()
  }
}
