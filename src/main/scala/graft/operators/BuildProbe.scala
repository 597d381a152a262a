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
    // drop the in-process fitted-model caches too, so the primed
    // IVF/PQ timings below include the artifact load, not a cache hit
    SimilarityIvf.clearFitCache()
    SimilarityPq.clearFitCache()
    Dedup.primeIndexes(spark, dir, idx)
    Seq("q_corpus_clean", "q_dedup_jaccard", "q_dedup_canonical",
      "q_dedup_incremental", "q_dedup_minhash", "q_knn_lsh",
      "q_knn_ivf", "q_knn_ivf_fit", "q_knn_exact",
      "q_knn_pq", "q_knn_pq_rerank", "q_knn_ivfpq", "q_pq_stats",
      "q_bpe_fertility", "q_source_overlap").foreach { q =>
      t(q) { graft.SparkEntry.queries(q)(spark, dir).count() }
    }
    spark.stop()
  }
}

/** Diagnostic utility: the per-batch ingest append measured — the
  * operational complement of PrimeProbe. Against an already-written
  * index (a copy, since the probe mutates it) and a batch-augmented
  * corpus dir, simulates a week of ingest as FIVE keyed batches
  * (`appendIndexes(rebuildPairs = false, batchId = ...)`), retries one
  * batch to show the idempotent-overwrite cost, first-touches an
  * index-backed query over the fragmented artifact, then runs
  * `compactIndexes` and first-touches again — quantifying both halves
  * of the maintenance design: cheap batch-sized appends with the
  * corpus-global pair rebuild deferred to its own schedule, and
  * periodic compaction to undo the append fragmentation.
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
    // the 5k-doc / 2k-vec augmentation lands as five keyed batches of
    // 1k docs + 400 vectors — a week of daily ingest, not one bulk load
    (0 until 5).foreach { i =>
      val (dLo, dHi) = (lo + i * 1000L, lo + (i + 1) * 1000L)
      val (eLo, eHi) = (lo + i * 400L, lo + (i + 1) * 400L)
      t(s"appendIndexes(batch-$i)") {
        Dedup.appendIndexes(spark, dir, idx,
          col("doc_id") >= dLo && col("doc_id") < dHi,
          Some(col("vec_id") >= eLo && col("vec_id") < eHi),
          rebuildPairs = false, batchId = Some(s"probe-$i"))
        0L
      }
    }
    t("appendIndexes(retry-4)") { // same key: overwrites its own directory
      Dedup.appendIndexes(spark, dir, idx,
        col("doc_id") >= lo + 4000L && col("doc_id") < lo + 5000L,
        Some(col("vec_id") >= lo + 1600L && col("vec_id") < lo + 2000L),
        rebuildPairs = false, batchId = Some("probe-4"))
      0L
    }
    t("q_dedup_minhash(fragmented)") { graft.SparkEntry.queries("q_dedup_minhash")(spark, dir).count() }
    t("q_knn_ivf_fit(fragmented)") { graft.SparkEntry.queries("q_knn_ivf_fit")(spark, dir).count() }
    t("compactIndexes") { Dedup.compactIndexes(spark, idx); 0L }
    SimilarityIvf.clearFitCache()
    t("primeIndexes(compacted)") { Dedup.primeIndexes(spark, dir, idx); 0L }
    t("q_dedup_minhash(compacted)") { graft.SparkEntry.queries("q_dedup_minhash")(spark, dir).count() }
    t("q_knn_ivf_fit(compacted)") { graft.SparkEntry.queries("q_knn_ivf_fit")(spark, dir).count() }
    t("rebuildPairTable(deferred)") { Dedup.rebuildPairTable(spark, dir, idx); 0L }
    t("q_dedup_jaccard(post)") { graft.SparkEntry.queries("q_dedup_jaccard")(spark, dir).count() }
    spark.stop()
  }
}

/** Diagnostic utility: streaming ingest-dedup latency at the probe
  * tier — the per-micro-batch cost of `nearDupIngest` (stream-side
  * MinHash + band join against the primed corpus index) and
  * `embNearDupIngest` (bucket-string probe against the primed LSH
  * index) when the static sides serve a 10× corpus from parquet
  * artifacts. Feeds micro-batches of half near-copies / half novel
  * rows through a memory sink and reports wall time per batch — the
  * number an operational continuous-dedup pipeline budgets against.
  *
  * sbt "runMain graft.operators.StreamProbe /tmp/graft_sf1 /tmp/probe_idx_10x"
  */
object StreamProbe {
  case class Doc(ts: java.sql.Timestamp, doc_id: Long, text: String)
  case class Vec(ts: java.sql.Timestamp, vec_id: Long, embedding: Seq[Float])

  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = args(0)
    val idx = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stream] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
    }
    t("primeIndexes") { Dedup.primeIndexes(spark, dir, idx); 0L }
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

    // text tier: 500-doc micro-batches, half one-token edits of corpus
    // docs (must flag), half shuffled novel text (must not)
    val corpus = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").limit(500).collect()
    val in = MemoryStream[Doc]
    val q = graft.streaming.IngestDedup.nearDupIngest(in.toDF(),
        graft.streaming.IngestDedup.corpusBands(spark, dir),
        graft.streaming.IngestDedup.corpusSignatures(spark, dir))
      .writeStream.format("memory").queryName("streamprobe")
      .outputMode("append").start()
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { b =>
      val docs = (0 until 500).map { i =>
        val src = corpus(rnd.nextInt(corpus.length))
        val text =
          if (i % 2 == 0) src.getString(1) + " probe edit"
          else rnd.shuffle(src.getString(1).split(" ").toSeq).mkString(" ")
        Doc(ts, 900000000L + b * 1000 + i, text)
      }
      in.addData(docs)
      t(s"nearDup batch-$b (500 docs)") { q.processAllAvailable(); spark.table("streamprobe").count() }
    }
    q.stop()

    // embedding tier: 200-vector micro-batches against the LSH index
    val base = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").limit(200).collect()
    val inV = MemoryStream[Vec]
    val qv = graft.streaming.IngestDedup.embNearDupIngest(inV.toDF(),
        graft.streaming.IngestDedup.corpusEmbBuckets(spark, dir),
        graft.streaming.IngestDedup.corpusEmbBase(spark, dir))
      .writeStream.format("memory").queryName("streamprobe_emb")
      .outputMode("append").start()
    (0 until 3).foreach { b =>
      val vecs = (0 until 200).map { i =>
        val src = base(rnd.nextInt(base.length)).getSeq[Float](1)
        val v =
          if (i % 2 == 0) src.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f)
          else Seq.fill(src.length)(rnd.nextGaussian().toFloat)
        Vec(ts, 910000000L + b * 1000 + i, v)
      }
      inV.addData(vecs)
      t(s"embNearDup batch-$b (200 vecs)") { qv.processAllAvailable(); spark.table("streamprobe_emb").count() }
    }
    qv.stop()
    spark.stop()
  }
}

/** Diagnostic utility: the adversarial band-flood bound measured.
  * Plants N byte-identical boilerplate documents on top of a probe
  * corpus — every copy hashes every MinHash band identically, so one
  * bucket per band captures the whole flood — then times the
  * star-capped candidate join (MaxBandDf) against the uncapped shape
  * on the same staged signature table. The uncapped join emits
  * 16·C(N,2) candidate rows (quadratic in the flood); the cap bounds
  * it at 16·(N−1) star pairs.
  *
  *   sbt "runMain graft.operators.FloodProbe /tmp/graft_sf1 2000"
  */
object FloodProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val floodN = if (args.length > 1) args(1).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, posexplode}
    val boiler = "subscribe to our newsletter for updates terms of service " +
      "all rights reserved contact us privacy policy cookie settings apply"
    val flood = (0 until floodN).map(i => (980000000L + i, boiler))
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(flood.toDF("doc_id", "text"))
    val sigs = docs
      .select(col("doc_id"), Dedup.minhashOfText(col("text")).as("sig"))
      .localCheckpoint() // stage once so both joins time ONLY the join
    val buckets = sigs.select(col("doc_id").as("id"),
      posexplode(Dedup.bandHashes(col("sig"))).as(Seq("band_idx", "band_hash")))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n pairs)")
    }
    (1 to 2).foreach { rep =>
      t(s"rep$rep capped (MaxBandDf)") {
        Dedup.starCappedPairs(buckets, Seq("band_idx", "band_hash")).count()
      }
      t(s"rep$rep uncapped") {
        Dedup.starCappedPairs(buckets, Seq("band_idx", "band_hash"),
          cap = Int.MaxValue).count()
      }
    }
    spark.stop()
  }
}
