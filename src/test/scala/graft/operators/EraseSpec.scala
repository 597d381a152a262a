package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Right-to-be-forgotten erasure: eraseDocuments must scrub the
  * corpus tables AND every id-decomposable artifact, re-derive the
  * content-bearing corpus-global aggregates, equal a from-scratch
  * index build on the reduced corpus (modulo the disclosed frozen
  * train-once models), recover from a mid-swap crash, and be
  * idempotent. */
class EraseSpec extends SparkSpec {
  import spark.implicits._

  /** Fresh corpus per test (erase mutates it): 6 docs (2 near-dups so
    * the pair/cluster artifacts are non-trivial) + 30 embeddings. */
  private def mkCorpus(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-erase").toString
    val base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    Seq(
      (1L, s"$base end1"), (2L, s"$base end2"),
      (3L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11"),
      (4L, "lone text with no relatives at all here"),
      (5L, s"$base end3"),
      (6L, "private row that must be forgotten entirely"))
      .map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rnd = new scala.util.Random(7)
    (0 until 30).map(i => (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat), i % 5))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def rows(path: String): Set[Seq[Any]] = {
    val f = new java.io.File(path)
    if (!f.exists()) Set.empty
    else spark.read.parquet(path).drop("batch_id").collect()
      .map(_.toSeq.map {
        case a: scala.collection.Seq[_] => a.toList
        case x => x
      }).toSet
  }

  /** Artifacts whose erase-vs-rebuild equality is NOT expected: the
    * frozen train-once models (erase keeps them; a rebuild refits on
    * the reduced corpus) and the row tables encoded under them. */
  private val frozenModel = Set("ivfCentroidsFit", "ivfCellsFit",
    "pqCodebooksFit", "pqCodes", "bpeMergesFit", "ivfProbeTuned",
    "lshProbeTuned", "pqRerankTuned")

  test("erase ≡ rebuild-on-reduced-corpus for every non-frozen artifact; corpus is scrubbed") {
    val dir = mkCorpus()
    val idx = java.nio.file.Files.createTempDirectory("graft-erase-idx").toString
    Dedup.writeIndexes(spark, dir, idx)
    Dedup.releaseIndexes(spark)
    SimilarityIvf.clearFitCache()
    val eraseDocs = Seq(2L, 6L)
    val eraseVecs = Seq(3L, 17L)
    Dedup.eraseDocuments(spark, dir, idx, eraseDocs, eraseVecs)

    // the corpus tables no longer carry the ids
    val docsLeft = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").as[Long].collect().toSet
    assert(docsLeft === Set(1L, 3L, 4L, 5L), s"documents after erase: $docsLeft")
    val vecsLeft = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").as[Long].collect().toSet
    assert(!vecsLeft.contains(3L) && !vecsLeft.contains(17L) && vecsLeft.size == 28)

    // no id-keyed artifact carries an erased row
    Seq("docShingles", "shingleIndex", "minhashSigs", "minhashBands",
      "simhashTable", "curationToks", "curationBpeToks").foreach { a =>
      val ids = spark.read.parquet(s"$idx/$a.parquet")
        .select("doc_id").as[Long].collect().toSet
      assert(eraseDocs.forall(id => !ids.contains(id)), s"$a still carries erased docs")
    }
    Seq("embBase", "lshBuckets", "ivfCells", "ivfCellsFit", "pqCodes",
      "sq8Codes").foreach { a =>
      val ids = spark.read.parquet(s"$idx/$a.parquet")
        .select("vec_id").as[Long].collect().toSet
      assert(eraseVecs.forall(id => !ids.contains(id)), s"$a still carries erased vecs")
    }

    // a from-scratch build on a pre-reduced COPY of the corpus must
    // produce the same rows for every non-frozen artifact — erase left
    // no residue and forgot nothing it shouldn't have
    val dirB = java.nio.file.Files.createTempDirectory("graft-erase-ref").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    spark.read.parquet(s"$dir/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$dirB/embeddings.parquet")
    // graph artifacts derive from orders/lineitem, absent in this fixture
    val idxB = java.nio.file.Files.createTempDirectory("graft-erase-idxB").toString
    Dedup.releaseIndexes(spark)
    SimilarityIvf.clearFitCache()
    Dedup.writeIndexes(spark, dirB, idxB)
    Seq("docShingles", "shingleIndex", "jaccardPairs", "minhashSigs",
      "minhashBands", "simhashTable", "embBase", "lshBuckets", "ivfCells",
      "sq8Codes", "curationToks", "curationBpeToks", "labelCentroids",
      "clusterLabels", "wordGraph", "nbQualityModel").foreach { a =>
      assert(rows(s"$idx/$a.parquet") === rows(s"$idxB/$a.parquet"),
        s"erase-vs-rebuild divergence in $a")
    }

    // queries served after the erase show no trace
    Dedup.releaseIndexes(spark)
    SimilarityIvf.clearFitCache()
    Dedup.primeIndexes(spark, dir, idx)
    val exact = Similarity.knnExact(spark, dir, nQueries = 5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!exact.contains(17L), "erased vector still served as a neighbor")
    val scored = TextAnalysis.nbQualityScore(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(scored === Set(1L, 3L, 4L, 5L))
  }

  test("mid-swap crash is repaired by re-running erase; erase is idempotent") {
    val dir = mkCorpus()
    val idx = java.nio.file.Files.createTempDirectory("graft-erase-crash").toString
    Dedup.writeIndexes(spark, dir, idx)
    Dedup.releaseIndexes(spark)
    Dedup.eraseDocuments(spark, dir, idx, Seq(6L))
    val after = rows(s"$idx/docShingles.parquet")
    // simulate a crash BETWEEN the two swap renames of a later erase:
    // the artifact is parked aside, a complete staging copy exists
    val p = new org.apache.hadoop.fs.Path(s"$idx/docShingles.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(p, new org.apache.hadoop.fs.Path(s"$idx/.old-docShingles.parquet")))
    // stage = the same content (the crashed attempt had finished its write)
    spark.read.parquet(s"$idx/.old-docShingles.parquet").drop("batch_id")
      .write.mode("overwrite").parquet(s"$idx/.compact-docShingles.parquet/batch_id=base")
    Dedup.releaseIndexes(spark)
    // re-running the SAME erase both repairs the swap and stays a no-op
    Dedup.eraseDocuments(spark, dir, idx, Seq(6L))
    assert(fs.exists(p), "crash recovery must restore the artifact path")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/.compact-docShingles.parquet")),
      "staging must be consumed or cleared")
    assert(rows(s"$idx/docShingles.parquet") === after,
      "idempotent re-erase must not change the artifact")
  }

  test("erasure surfaces a re-index recommendation at the CUMULATIVE threshold") {
    val dir = mkCorpus()
    val idx = java.nio.file.Files.createTempDirectory("graft-erase-advice").toString
    Dedup.writeIndexes(spark, dir, idx) // geometry fitted on 30 vectors
    // below threshold: 2 of the 30 fitted vectors (6.7% < 25%) — no
    // marker; the frozen models still summarize the corpus
    Dedup.eraseDocuments(spark, dir, idx, Nil, vecIds = Seq(28L, 29L))
    assert(Reindex.readAdvice(spark, idx).isEmpty,
      "small erase must not recommend a reindex")
    // a SECOND sub-25% erase (5 more → cumulative 7/30 = 23.3%) still
    // stays silent — but the fraction is measured against the FITTED
    // size, not the shrunken corpus
    Dedup.eraseDocuments(spark, dir, idx, Nil, vecIds = (23L to 27L))
    assert(Reindex.readAdvice(spark, idx).isEmpty,
      s"cumulative 23.3% must stay below the 25% threshold")
    // one more small erase crosses cumulatively (9/30 = 30%) although
    // this call alone removes only 2 of the remaining 23 (8.7%) — the
    // accumulation is exactly what a per-call fraction would miss
    Dedup.eraseDocuments(spark, dir, idx, Nil, vecIds = Seq(21L, 22L))
    val advice = Reindex.readAdvice(spark, idx)
    assert(advice.exists { case (reason, frac) =>
      reason == "erase" && math.abs(frac - 0.3) < 1e-9 }, s"advice wrong: $advice")
    // the re-index verb resolves the recommendation and restarts the
    // ledger at the reduced corpus
    Dedup.reindexArtifacts(spark, dir, idx)
    assert(Reindex.readAdvice(spark, idx).isEmpty,
      "reindex must clear the advice marker")
    assert(Reindex.readGeometryBaseline(spark, idx).contains(21L),
      "reindex must restart the erased-fraction ledger at the refit size")
    Dedup.releaseIndexes(spark)
    Similarity.invalidateCorpusH(spark, dir)
    SimilarityIvf.invalidateCorpusK(spark, dir)
  }

  test("appends cannot dilute the erased-fraction ledger (explicit erased counter)") {
    val dir = mkCorpus() // 30 vectors — the geometry is FITTED on these
    val idx = java.nio.file.Files.createTempDirectory("graft-erase-dilute").toString
    Dedup.writeIndexes(spark, dir, idx)
    // the corpus DOUBLES after the fit: 30 appended vectors the frozen
    // quantizers never saw
    val rnd = new scala.util.Random(41)
    val grown = spark.read.parquet(s"$dir/embeddings.parquet").unionByName(
      (30 until 60).map(i => (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat), i % 5))
        .toDF("vec_id", "embedding", "label"))
    grown.write.mode("overwrite").parquet(s"$dir/embeddings_g.parquet")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/embeddings_g.parquet"),
      new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"))
    Dedup.appendIndexes(spark, dir, idx,
      docPredicate = col("doc_id") < 0L,
      embPredicate = Some(col("vec_id") >= 30L),
      rebuildPairs = false, batchId = Some("growth"))
    assert(Reindex.readAdvice(spark, idx).isEmpty,
      "2x growth sits inside the sizing bands — no append advice expected here")
    // erase 12 of the 30 FITTED vectors: 40% of the corpus the frozen
    // models summarize, but only 20% of the grown corpus — the
    // remaining-count formulation read this as 1 − 48/30 < 0 and never
    // advised; the explicit ledger reads 12/30 = 0.4
    Dedup.eraseDocuments(spark, dir, idx, Nil, vecIds = (0L to 11L))
    val advice = Reindex.readAdvice(spark, idx)
    assert(advice.exists { case (reason, frac) =>
      reason == "erase" && math.abs(frac - 0.4) < 1e-9 },
      s"append-diluted erase must still advise at 40% of the fitted corpus: $advice")
    Dedup.releaseIndexes(spark)
    Similarity.invalidateCorpusH(spark, dir)
    SimilarityIvf.invalidateCorpusK(spark, dir)
  }

  test("erase fails fast while an appender marker is live (lease discipline)") {
    val dir = mkCorpus()
    val idx = java.nio.file.Files.createTempDirectory("graft-erase-lease").toString
    Dedup.writeIndexes(spark, dir, idx)
    Dedup.releaseIndexes(spark)
    intercept[IllegalStateException] {
      IndexLease.withShared(spark, idx, "test-appender") {
        Dedup.eraseDocuments(spark, dir, idx, Seq(6L))
      }
    }
  }
}
