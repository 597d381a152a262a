package graft.operators

import org.apache.spark.sql.functions._

/** Dev probe: the three online-serving heads (LSH / IVF / IVF+PQ) at
  * a scaled-up corpus, answering a 1000-query batch of NEVER-SEEN
  * vectors — the measurement behind the serving-cost claims: the LSH
  * and IVF heads fetch full-precision vectors for every probed
  * candidate, the IVF+PQ head ranks candidates in the compressed
  * domain and fetches floats only for the tuned shortlist, so its
  * advantage should grow with corpus size (candidate sets grow with
  * the corpus; shortlists do not).
  *
  * sbt "runMain graft.operators.ServeScaleProbe /root/testdata/sf0.1 20"
  */
object ServeScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 20
    val batchN = if (args.length > 2) args(2).toInt else 1000
    // "all" = the three heads; "lsh" = LSH head + a brute-force recall
    // audit only (skips the ~400 s IVF/PQ fit+tune — the mode that
    // measures the corpus-sized plane count's speed/recall trade)
    val mode = if (args.length > 3) args(3) else "all"
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
    val dir = java.nio.file.Files.createTempDirectory("graft_serve_scale").toString
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
    // the query batch: corpus-DERIVED but never-seen vectors (a fixed
    // perturbation no replica uses), ids far outside the corpus range
    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < batchN)
      .select((col("vec_id") + lit(10000000L)).as("query_id"),
        transform(col("embedding"), x => x * lit(1.0001f) + lit(0.0005f))
          .as("embedding"))
    queries.write.mode("overwrite").parquet(s"$dir/queryBatch.parquet")
    val qb = spark.read.parquet(s"$dir/queryBatch.parquet")

    if (mode == "all") {
      // fit/tune once, outside the timed serving samples (train-once
      // artifacts in production; the probe measures SERVING)
      t("fit centroids + tune nprobe") {
        SimilarityIvf.tunedProbe(spark, dir)
      }
      t("fit codebooks + tune rerank shortlist") {
        SimilarityPq.tunedRerankCands(spark, dir)
      }
      println(s"[probe] budgets: nprobe=${SimilarityIvf.tunedProbe(spark, dir)}" +
        s" of ${SimilarityIvf.corpusK(spark, dir)} cells," +
        s" rerankCands=${SimilarityPq.tunedRerankCands(spark, dir)}")
    }

    // "pipeline" mode measures ONLY the mining/drift legs below — no
    // LSH head samples, no LSH bucket build on its wall
    val heads: Seq[(String, () => Long)] = (if (mode == "pipeline") Seq.empty
     else Seq(
      "lsh head (float fetch per candidate)" ->
        (() => Similarity.annServeBatch(spark, dir, qb).count()))) ++
      (if (mode == "all") Seq(
        "ivf head (float fetch per candidate)" ->
          (() => Similarity.annServeBatchIvf(spark, dir, qb).count()),
        "ivfpq head (ADC + shortlist-only floats)" ->
          (() => Similarity.annServeBatchIvfPq(spark, dir, qb).count()))
       else Seq.empty)
    heads.foreach { case (tag, f) =>
      t(s"$tag WARM-UP")(f())
      (1 to 2).foreach(i => t(s"$tag sample $i") {
        val n = f(); println(s"[probe]   served rows: $n")
      })
    }

    // Per-CALL overhead audit (round-17 ask): the r16 serve heads
    // consult the reindex-advice marker (an FS existence probe) on
    // every call — measure the fixed cost of a MINIMAL serve call
    // (1-query batch, warm artifacts) so the per-call budget is a
    // pinned number, not an assumption. Ten consecutive calls per
    // head; report each + the min (the steady-state per-call floor).
    if (mode == "all") {
      val q1 = qb.limit(1).cache()
      q1.count()
      val callHeads: Seq[(String, () => Long)] = Seq(
        "lsh" -> (() => Similarity.annServeBatch(spark, dir, q1).count()),
        "ivf" -> (() => Similarity.annServeBatchIvf(spark, dir, q1).count()),
        "ivfpq" -> (() => Similarity.annServeBatchIvfPq(spark, dir, q1).count()))
      callHeads.foreach { case (tag, f) =>
        f() // plan warm
        val walls = (1 to 10).map { _ =>
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] per-call $tag%-6s min ${walls.min}%.3f s  " +
          f"med ${walls.sorted.apply(5)}%.3f s  " +
          s"all ${walls.map(w => f"$w%.3f").mkString("/")}")
      }
      // the STREAM twin's per-micro-batch cost: same head inside
      // foreachBatch, MemoryStream-driven — the serving cadence the
      // AnnServe streams run in production
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq2: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ms = MemoryStream[(Long, Seq[Float])]
      val qrows = qb.limit(12).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      val batchWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
      val sq = graft.streaming.AnnServe.annServeIngest(
        ms.toDF().toDF("query_id", "embedding"), spark, dir) { out =>
        val t0 = System.nanoTime(); out.count()
        batchWalls += (System.nanoTime() - t0) / 1e9
      }
      try {
        qrows.grouped(2).foreach { g =>
          ms.addData(g.toSeq: _*); sq.processAllAvailable()
        }
      } finally sq.stop()
      if (batchWalls.nonEmpty)
        println(f"[probe] per-micro-batch stream serve: min ${batchWalls.min}%.3f s  " +
          s"all ${batchWalls.map(w => f"$w%.3f").mkString("/")}")
    }

    // Round-14 pipeline legs at the same tier: the mining/monitoring
    // components that ride the fitted-cell index. "pipeline" mode
    // fits the quantizer only (no PQ tune) and measures these alone.
    if (mode == "pipeline") {
      t("fit centroids (pipeline mode)") {
        SimilarityIvf.fitCentroids(spark, dir)
      }
      val legs: Seq[(String, () => Long)] = Seq(
        "hard-negatives ANN (10 anchors)" ->
          (() => EmbeddingOps.hardNegativesAnn(spark, dir).count()),
        "training triplets ANN (10 anchors)" ->
          (() => EmbeddingOps.trainingTripletsAnn(spark, dir).count()),
        "embedding drift (corpus snapshot split)" ->
          (() => EmbeddingOps.embeddingDrift(spark, dir).count()),
        s"drift gate batch kernel ($batchN-vector batch)" ->
          (() => graft.streaming.DriftGate.driftReport(
            qb.select(col("query_id").as("vec_id"), col("embedding")),
            spark, dir).count()))
      legs.foreach { case (tag, f) =>
        t(s"$tag WARM-UP")(f())
        (1 to 2).foreach(i => t(s"$tag sample $i") {
          val n = f(); println(s"[probe]   rows: $n")
        })
      }
    }

    // Recall audit of the LSH head at this tier: the corpus-sized
    // plane count trades per-table collision probability for bounded
    // occupancy, so the recall at radius 1 must be MEASURED here, not
    // assumed from the 8-plane test tier. Brute-force exact top-k for
    // a query subsample vs the head's served neighbors. Skipped in
    // "pipeline" mode (it would pull the LSH bucket build + a
    // full-corpus crossJoin onto a probe that measures other legs).
    if (mode == "pipeline") { spark.stop(); return }
    val auditN = math.min(100, batchN)
    val qa = qb.filter(col("query_id") < 10000000L + auditN)
    val served = Similarity.annServeBatch(spark, dir, qa)
      .select(col("query_id"), col("neighbor_id"))
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.ArrayDotProduct(a, b)
    val qv = qa.select(col("query_id"), col("embedding").as("v_q"))
      .withColumn("nrm_q", sqrt(dot(col("v_q"), col("v_q"))))
    val cv = base.select(col("vec_id").as("neighbor_id"), col("embedding").as("v_c"))
      .withColumn("nrm_c", sqrt(dot(col("v_c"), col("v_c"))))
      .filter(col("nrm_c") > 0d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val exact = cv.crossJoin(broadcast(qv))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("v_q"), col("v_c")) / (col("nrm_q") * col("nrm_c"))).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("query_id", "neighbor_id")
    t(s"lsh recall audit ($auditN queries vs brute force)") {
      val r = exact.join(served.withColumn("hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n"), count(col("hit")).as("hits"))
        .collect()(0)
      println(f"[probe]   lsh head recall@5: ${r.getLong(1).toDouble / r.getLong(0)}%.3f " +
        s"(${r.getLong(1)}/${r.getLong(0)})")
    }
    spark.stop()
  }
}
