package graft.operators

import graft.SparkSpec

/** Pins the parquet index persistence round-trip: writeIndexes
  * materializes every session index artifact, primeIndexes serves
  * later queries from the parquet files (not a rebuild), and the
  * served results are identical to the built ones.
  */
class IndexPersistenceSpec extends SparkSpec {
  import spark.implicits._

  /** Fixture corpus with both a documents and an embeddings table so
    * all eight index artifacts are exercised. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-idx-docs").toString
    val base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    Seq(
      (1L, s"$base end1"), (2L, s"$base end2"),
      (3L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11"),
      (4L, "lone text with no relatives at all here"))
      .map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rnd = new scala.util.Random(7)
    (0 until 30).map(i => (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat), i % 5))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private val artifacts = Seq("docShingles", "shingleIndex", "jaccardPairs",
    "minhashSigs", "minhashBands", "simhashTable", "embBase", "lshBuckets",
    "ivfCells", "ivfCentroidsFit", "ivfCellsFit", "ivfProbeTuned", "lshProbeTuned",
    "pqRerankTuned", "pqCodebooksFit", "pqCodes",
    "bpeMergesFit", "curationToks", "curationBpeToks", "labelCentroids", "sq8Codes",
    "clusterLabels", "wordGraph", "nbQualityModel")

  test("tuned probe budget is a persisted artifact: primed sessions serve it, not re-walk it") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft-idx-tune").toString
    Dedup.writeIndexes(spark, dir, indexDir)
    val p = s"$indexDir/ivfProbeTuned.parquet"
    assert(new java.io.File(p).exists(), "ivfProbeTuned artifact not written")
    val written = spark.read.parquet(p)
      .select("k", "nprobe").as[(Int, Int)].collect().toMap
    assert(written.contains(5), s"no tuned budget for the served k: $written")
    // the artifact must hold what the in-session walk would choose
    Dedup.releaseIndexes(spark)
    SimilarityIvf.clearFitCache()
    Dedup.primeIndexes(spark, dir, indexDir)
    assert(SimilarityIvf.tunedProbe(spark, dir) === written(5),
      "primed tuned budget diverges from the persisted walk")
    // PROOF the primed session reads the artifact instead of
    // re-walking the ladder: poison the persisted budget and observe
    // the poisoned value served verbatim — a re-walk could never
    // produce it (the real walk just chose a different number above)
    val poisoned = written(5) + 7
    Seq((5, poisoned)).toDF("k", "nprobe")
      .write.mode("overwrite").parquet(s"$p/batch_id=base")
    Dedup.releaseIndexes(spark)
    SimilarityIvf.clearFitCache()
    Dedup.primeIndexes(spark, dir, indexDir)
    assert(SimilarityIvf.tunedProbe(spark, dir) === poisoned,
      "tunedProbe re-walked the ladder instead of serving the primed artifact")
    // the PQ rerank twin obeys the same artifact-wins rule
    val rp = s"$indexDir/pqRerankTuned.parquet"
    val rWritten = spark.read.parquet(rp)
      .select("k", "cands").as[(Int, Int)].collect().toMap
    assert(rWritten.contains(5), s"no tuned shortlist for the served k: $rWritten")
    val rPoisoned = rWritten(5) + 3
    Seq((5, rPoisoned)).toDF("k", "cands")
      .write.mode("overwrite").parquet(s"$rp/batch_id=base")
    Dedup.releaseIndexes(spark)
    SimilarityPq.clearFitCache()
    Dedup.primeIndexes(spark, dir, indexDir)
    assert(SimilarityPq.tunedRerankCands(spark, dir) === rPoisoned,
      "tunedRerankCands re-walked the ladder instead of serving the primed artifact")
  }

  test("writeIndexes → releaseIndexes → primeIndexes serves identical results from parquet") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft-idx").toString
    Dedup.writeIndexes(spark, dir, indexDir)
    artifacts.foreach { a =>
      assert(new java.io.File(s"$indexDir/$a.parquet").exists(), s"missing artifact $a")
    }

    val builtPairs = Dedup.jaccardPairs(spark, dir)
      .select("id_a", "id_b", "n_common").as[(Long, Long, Long)].collect().toSet
    val builtLsh = Dedup.minhashLsh(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val builtIvf = SimilarityIvf.annIvf(spark, dir)
      .select("query_id", "neighbor_id", "rn").as[(Long, Long, Int)].collect().toSet
    val builtIvfFit = SimilarityIvf.annIvfFitted(spark, dir)
      .select("query_id", "neighbor_id", "rn").as[(Long, Long, Int)].collect().toSet
    val builtCents = SimilarityIvf.fitCentroids(spark, dir)
    val builtPq = SimilarityPq.knnPq(spark, dir)
      .select("query_id", "neighbor_id", "rn").as[(Long, Long, Int)].collect().toSet
    val builtCbs = SimilarityPq.fitCodebooks(spark, dir)
    assert(builtPairs.nonEmpty && builtIvf.nonEmpty)

    Dedup.releaseIndexes(spark)
    SimilarityIvf.clearFitCache()
    SimilarityPq.clearFitCache()
    Dedup.primeIndexes(spark, dir, indexDir)

    // The primed pair table must be the parquet artifact, not a rebuild.
    val primed = Dedup.jaccardPairTable(spark, dir)
    assert(primed.inputFiles.nonEmpty && primed.inputFiles.forall(_.contains(indexDir)),
      s"primed table not served from $indexDir: ${primed.inputFiles.take(3).mkString(",")}")
    // … and so must both IVF cell indexes: a primed session does ZERO
    // assignment work (the scans below read the parquet artifact).
    Seq(SimilarityIvf.ivfCells(spark, dir), SimilarityIvf.ivfCellsFit(spark, dir))
      .foreach { cells =>
        assert(cells.inputFiles.nonEmpty && cells.inputFiles.forall(_.contains(indexDir)),
          "primed IVF cell index not served from parquet")
      }
    // … and the fitted quantizer loads from the artifact, not a refit
    // (fit cache cleared above, so a refit would be the only other way).
    assert(SimilarityIvf.fitCentroids(spark, dir) == builtCents,
      "primed centroids differ from the fitted model that was persisted")
    // the PQ pair follows: code table served from parquet, model loaded
    // from the artifact (PQ fit cache cleared above)
    val primedCodes = SimilarityPq.pqCodes(spark, dir)
    assert(primedCodes.inputFiles.nonEmpty &&
      primedCodes.inputFiles.forall(_.contains(indexDir)),
      "primed PQ code table not served from parquet")
    assert(SimilarityPq.fitCodebooks(spark, dir) == builtCbs,
      "primed PQ codebooks differ from the fitted model that was persisted")

    val primedPairs = Dedup.jaccardPairs(spark, dir)
      .select("id_a", "id_b", "n_common").as[(Long, Long, Long)].collect().toSet
    val primedLsh = Dedup.minhashLsh(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val primedIvf = SimilarityIvf.annIvf(spark, dir)
      .select("query_id", "neighbor_id", "rn").as[(Long, Long, Int)].collect().toSet
    val primedIvfFit = SimilarityIvf.annIvfFitted(spark, dir)
      .select("query_id", "neighbor_id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(primedPairs == builtPairs)
    assert(primedLsh == builtLsh)
    assert(primedIvf == builtIvf)
    assert(primedIvfFit == builtIvfFit)
    val primedPq = SimilarityPq.knnPq(spark, dir)
      .select("query_id", "neighbor_id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(primedPq == builtPq)
    Dedup.releaseIndexes(spark)
  }

  test("appendIndexes: old corpus + appended batch equals a full rebuild, artifact by artifact") {
    import org.apache.spark.sql.functions.col
    // Same corpus split two ways: dirOld holds only the pre-batch rows,
    // dirFull holds everything. Indexes written from dirOld then
    // appended with dirFull's batch rows must equal indexes rebuilt
    // from dirFull wholesale.
    val allDocs = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end1"),
      (2L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end2"),
      (3L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11"),
      (4L, "lone text with no relatives at all here"),
      // the appended batch: one near-dup of doc 1, one novel doc
      (5L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end5"),
      (6L, "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11"))
      .map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
    val rnd = new scala.util.Random(11)
    val allEmb = (0 until 40).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat), i % 5))
    def mkDir(docIds: Long => Boolean, embIds: Long => Boolean): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-idx-append").toString
      allDocs.filter(r => docIds(r._1))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      allEmb.filter(r => embIds(r._1))
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      d
    }
    val dirOld = mkDir(_ <= 4, _ < 30)
    val dirFull = mkDir(_ => true, _ => true)

    val idxA = java.nio.file.Files.createTempDirectory("graft-idx-a").toString
    Dedup.writeIndexes(spark, dirOld, idxA)
    Dedup.releaseIndexes(spark)
    Dedup.appendIndexes(spark, dirFull, idxA,
      docPredicate = col("doc_id") >= 5L,
      embPredicate = Some(col("vec_id") >= 30L))

    // the session serves the appended artifacts right after the call
    val served = Dedup.jaccardPairTable(spark, dirFull)
    assert(served.inputFiles.nonEmpty && served.inputFiles.forall(_.contains(idxA)))
    // the appended near-dup pair (1,5) must be present with high overlap
    val pair = served.filter(col("id_a") === 1L && col("id_b") === 5L).collect()
    assert(pair.length == 1, "appended batch's near-dup pair missing from pair table")

    val idxB = java.nio.file.Files.createTempDirectory("graft-idx-b").toString
    Dedup.releaseIndexes(spark)
    Dedup.writeIndexes(spark, dirFull, idxB)

    // The fitted-quantizer family is train-once BY DESIGN: a rebuild
    // from dirFull refits k-means on the grown corpus, while an append
    // keeps the original model and assigns the batch under it — so
    // those two artifacts are compared against the ORIGINAL-centroid
    // reference below, not against the rebuild.
    // batch_id is internal layout (base vs the appended batch's
    // partition) — content equivalence is over the artifact schema
    // bpeMergesFit is train-once: the appended index keeps the OLD
    // corpus's tokenizer (by design), the rebuild trains on the full
    // corpus — so like the quantizer artifacts it is excluded from the
    // content-equality sweep
    // the PQ pair follows the same train-once posture: the append keeps
    // the original codebooks (and encodes the batch under them), the
    // rebuild refits — compared against the original-model reference
    // below instead
    // ivfProbeTuned rides the frozen quantizer the same way: the
    // append keeps the budget tuned under the original centroids, the
    // rebuild re-walks the ladder on the grown corpus — train-once,
    // excluded from the strict sweep like the model artifacts above
    artifacts.filterNot(Set("ivfCentroidsFit", "ivfCellsFit", "bpeMergesFit",
        "pqCodebooksFit", "pqCodes", "ivfProbeTuned", "lshProbeTuned",
        "pqRerankTuned"))
      .foreach { a =>
      val appended = spark.read.parquet(s"$idxA/$a.parquet").drop("batch_id")
      val rebuilt = spark.read.parquet(s"$idxB/$a.parquet").drop("batch_id")
      assert(appended.columns.toSeq == rebuilt.columns.toSeq, s"$a schema drift")
      val ap = appended.collect().map(_.toSeq).toSet
      val rb = rebuilt.collect().map(_.toSeq).toSet
      assert(ap == rb, s"artifact $a: append differs from full rebuild")
    }
    // Appended fitted-cell index ≡ assigning the FULL corpus under the
    // ORIGINAL (pre-append) quantizer: one cell geometry across old and
    // new rows, model untouched by the append.
    val origCents = SimilarityIvf.readCentroidArtifact(spark, idxA).get
    val appendedFit = spark.read.parquet(s"$idxA/ivfCellsFit.parquet")
      .drop("batch_id").as[(Long, Int)].collect().toSet
    Dedup.releaseIndexes(spark)
    val referenceFit = SimilarityIvf
      .ivfAssign(Similarity.embBase(spark, dirFull), origCents)
      .as[(Long, Int)].collect().toSet
    assert(appendedFit == referenceFit,
      "fitted cell append must equal full-corpus assignment under the original quantizer")
    // Same invariant for the PQ code table: appended codes ≡ encoding
    // the full corpus under the ORIGINAL codebooks.
    val origCbs = SimilarityPq.readCodebookArtifact(spark, idxA).get
    val appendedCodes = spark.read.parquet(s"$idxA/pqCodes.parquet")
      .drop("batch_id").as[(Long, Seq[Int])].collect()
      .map { case (id, cs) => (id, cs.toList) }.toSet
    Dedup.releaseIndexes(spark)
    val referenceCodes = SimilarityPq
      .pqAssign(Similarity.embBase(spark, dirFull), origCbs)
      .as[(Long, Seq[Int])].collect()
      .map { case (id, cs) => (id, cs.toList) }.toSet
    assert(appendedCodes == referenceCodes,
      "PQ code append must equal full-corpus encoding under the original codebooks")
    Dedup.releaseIndexes(spark)
  }

  test("appendGraphEdges: delta order batch equals a full rebuild of graphEdgeFracs") {
    import org.apache.spark.sql.functions.col
    // order graph split two ways: the 'old' view has orders < 30, the
    // full view adds a batch that touches an existing (customer,
    // supplier) pair (delta count merge), a new supplier for an
    // existing customer, and a brand-new customer (new src rows) —
    // every frac of a touched src must re-derive
    val orders = Seq(
      (10L, 1L), (11L, 1L), (20L, 2L), (21L, 3L),
      (30L, 1L), (31L, 4L), (32L, 2L))
    val lineitem = Seq(
      (10L, 7L), (11L, 7L), (11L, 8L), (20L, 7L), (21L, 9L),
      (30L, 7L), (30L, 9L), (31L, 8L), (32L, 10L))
    def mkDir(okey: Long => Boolean): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-graph-app").toString
      orders.filter(o => okey(o._1)).toDF("o_orderkey", "o_custkey")
        .write.mode("overwrite").parquet(s"$d/orders.parquet")
      lineitem.toDF("l_orderkey", "l_suppkey")
        .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
      d
    }
    val dirOld = mkDir(_ < 30)
    val dirFull = mkDir(_ => true)
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.select("src", "dst", "w", "frac").collect().map(_.toSeq).toSet
    // expected BEFORE the append memoizes the artifact under dirFull
    val expected = rows(Graph.edgeFracs(spark, dirFull))
    val idx = java.nio.file.Files.createTempDirectory("graft-graph-idx").toString
    Graph.edgeFracs(spark, dirOld).write.mode("overwrite")
      .parquet(s"$idx/graphEdgeFracs.parquet/batch_id=base")
    Graph.appendGraphEdges(spark, dirFull, idx, col("o_orderkey") >= 30L)
    val got = rows(spark.read.parquet(s"$idx/graphEdgeFracs.parquet")
      .drop("batch_id"))
    assert(got === expected,
      "appended graph artifact diverges from the wholesale rebuild")
    // the session now serves the fresh artifact for dirFull
    assert(rows(Graph.edgeFracs(spark, dirFull)) === expected)
    Dedup.releaseIndexes(spark)
  }

  test("appendWordGraph: delta doc batch equals a full rebuild of wordGraph") {
    import org.apache.spark.sql.functions.col
    // two-era document corpus: the batch repeats an existing
    // co-occurrence pair (additive merge), introduces a new pair for
    // an existing word (its out-weight re-derives), and a brand-new
    // word pair — every frac of a touched src must re-derive
    val docs = Seq(
      (1L, "alpha bridge gamma bridge alpha"),
      (2L, "alpha bridge delta delta gamma"),
      (10L, "alpha bridge epsilon zeta"),
      (11L, "theta kappa theta kappa"))
    def mkDir(keep: Long => Boolean): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-wg-app").toString
      docs.filter(x => keep(x._1))
        .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val dirOld = mkDir(_ < 10)
    val dirFull = mkDir(_ => true)
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.select("src", "dst", "w", "frac").collect().map(_.toSeq).toSet
    val expected = rows(TextAnalysis.wordGraph(spark, dirFull))
    val idx = java.nio.file.Files.createTempDirectory("graft-wg-idx").toString
    TextAnalysis.wordGraph(spark, dirOld).write.mode("overwrite")
      .parquet(s"$idx/wordGraph.parquet/batch_id=base")
    TextAnalysis.appendWordGraph(spark, dirFull, idx, col("doc_id") >= 10L)
    val got = rows(spark.read.parquet(s"$idx/wordGraph.parquet").drop("batch_id"))
    assert(got === expected,
      "appended word graph diverges from the wholesale rebuild")
    // the session now serves the fresh artifact for dirFull
    assert(rows(TextAnalysis.wordGraph(spark, dirFull)) === expected)
    // exactly-once under a batch id: the retried batch is a no-op
    TextAnalysis.appendWordGraph(spark, dirFull, idx,
      col("doc_id") >= 10L, batchId = Some("b1"))
    TextAnalysis.appendWordGraph(spark, dirFull, idx,
      col("doc_id") >= 10L, batchId = Some("b1"))
    val once = spark.read.parquet(s"$idx/wordGraph.parquet").drop("batch_id")
      .filter(col("src") === "alpha" && col("dst") === "bridge")
      .select("w").collect().map(_.getLong(0))
    // base(3 via dirOld docs 1,2) + dirFull batch (1, applied once in
    // the unkeyed append) + b1 applied exactly once more = 5
    assert(once.toSeq === Seq(5L),
      s"keyed retry must not double-count the batch: ${once.toSeq}")
    Dedup.releaseIndexes(spark)
  }

  test("appendGraphEdges: a crash between the swap renames recovers to the pre-append state") {
    import org.apache.spark.sql.functions.col
    val orders = Seq((10L, 1L), (20L, 2L), (30L, 3L))
    val lineitem = Seq((10L, 7L), (20L, 7L), (30L, 8L))
    val d = java.nio.file.Files.createTempDirectory("graft-graph-rec").toString
    orders.toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    lineitem.toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-graph-rec-idx").toString
    Graph.edgeFracs(spark, d).write.mode("overwrite")
      .parquet(s"$idx/graphEdgeFracs.parquet/batch_id=base")
    val before = spark.read.parquet(s"$idx/graphEdgeFracs.parquet")
      .drop("batch_id").collect().map(_.toSeq).toSet
    // simulate the crash window: artifact renamed away, staging
    // complete — exactly the state between the two renames
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$idx/graphEdgeFracs.parquet"),
      new org.apache.hadoop.fs.Path(s"$idx/.graphEdgeFracs.old.parquet")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$idx/.graphEdgeFracs.append.parquet/batch_id=base"))
    // the rerun must restore the OLD generation and apply the batch ONCE
    Graph.appendGraphEdges(spark, d, idx, col("o_orderkey") >= 30L)
    val after = spark.read.parquet(s"$idx/graphEdgeFracs.parquet")
      .drop("batch_id").collect().map(_.toSeq).toSet
    // (the fixture's append re-adds order 30, already in `before` —
    // so counts for its edge DOUBLE: proof the recovery restored the
    // pre-append base and the append then ran exactly once, rather
    // than resurrecting the staged post-append state)
    assert(after.exists(r => r(0) == 6L && r(2) == 2L),
      s"c3-s8 edge must carry w=2 after base(1)+delta(1): $after")
    assert(before.exists(r => r(0) == 6L && r(2) == 1L))
    Dedup.releaseIndexes(spark)
  }

  test("appendGraphEdges with a batchId is exactly-once: the retried batch is a no-op") {
    import org.apache.spark.sql.functions.col
    val d = java.nio.file.Files.createTempDirectory("graft-graph-b").toString
    Seq((10L, 1L), (30L, 3L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((10L, 7L), (30L, 8L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-graph-b-idx").toString
    Graph.edgeFracs(spark, d).filter(col("w") >= 0 && col("src") >= 0)
      .write.mode("overwrite").parquet(s"$idx/graphEdgeFracs.parquet/batch_id=base")
    def rows() = spark.read.parquet(s"$idx/graphEdgeFracs.parquet")
      .drop("batch_id").collect().map(_.toSeq).toSet
    Graph.appendGraphEdges(spark, d, idx, col("o_orderkey") >= 30L,
      batchId = Some("b1"))
    val afterOnce = rows()
    // a bare re-run would double-count order 30's edge; the keyed
    // retry must change NOTHING
    Graph.appendGraphEdges(spark, d, idx, col("o_orderkey") >= 30L,
      batchId = Some("b1"))
    assert(rows() === afterOnce, "retried keyed batch re-applied")
    // a NEW batch id applies normally
    Graph.appendGraphEdges(spark, d, idx, col("o_orderkey") >= 30L,
      batchId = Some("b2"))
    assert(rows() !== afterOnce, "fresh batch id must apply")
    Dedup.releaseIndexes(spark)
  }

  test("appendGraphEdges keyed: a crash AFTER the swap but BEFORE the marker still lands exactly once") {
    import org.apache.spark.sql.functions.col
    val d = java.nio.file.Files.createTempDirectory("graft-graph-pm").toString
    Seq((10L, 1L), (30L, 3L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((10L, 7L), (30L, 8L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-graph-pm-idx").toString
    Graph.edgeFracs(spark, d).write.mode("overwrite")
      .parquet(s"$idx/graphEdgeFracs.parquet/batch_id=base")
    def rows() = spark.read.parquet(s"$idx/graphEdgeFracs.parquet")
      .drop("batch_id").collect().map(_.toSeq).toSet
    val base = rows()
    Graph.appendGraphEdges(spark, d, idx, col("o_orderkey") >= 30L,
      batchId = Some("bx"))
    val applied = rows()
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the post-swap pre-marker crash of a SECOND attempt of
    // the SAME batch: artifact post-append, the batch-named rollback
    // copy holding the PRE-append generation, marker never published
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$idx/.graphEdgeFracs.applied/batch-bx"), true)
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        base.toSeq.map(r => org.apache.spark.sql.Row.fromSeq(r))),
      spark.read.parquet(s"$idx/graphEdgeFracs.parquet").drop("batch_id").schema)
      .write.mode("overwrite")
      .parquet(s"$idx/.graphEdgeFracs.old.bx.parquet/batch_id=base")
    // the artifact itself stays post-append (the crashed attempt had
    // completed its swap); retry must ROLL BACK and apply once
    Graph.appendGraphEdges(spark, d, idx, col("o_orderkey") >= 30L,
      batchId = Some("bx"))
    assert(rows() === applied,
      "post-swap pre-marker retry must land the batch exactly once")
    // and the marker now exists, so a further retry is a no-op
    Graph.appendGraphEdges(spark, d, idx, col("o_orderkey") >= 30L,
      batchId = Some("bx"))
    assert(rows() === applied)
    Dedup.releaseIndexes(spark)
  }

  test("appendGraphEdges onto a never-written artifact fails fast") {
    import org.apache.spark.sql.functions.col
    val idx = java.nio.file.Files.createTempDirectory("graft-graph-idx0").toString
    val e = intercept[IllegalArgumentException] {
      Graph.appendGraphEdges(spark, dir, idx, col("o_orderkey") > 0L)
    }
    assert(e.getMessage.contains("writeIndexes first"))
  }

  test("appendIndexes with an empty batch leaves artifacts equivalent to the originals") {
    import org.apache.spark.sql.functions.col
    val indexDir = java.nio.file.Files.createTempDirectory("graft-idx-empty-batch").toString
    Dedup.releaseIndexes(spark)
    Dedup.writeIndexes(spark, dir, indexDir)
    val before = spark.read.parquet(s"$indexDir/jaccardPairs.parquet")
      .collect().map(_.toSeq).toSet
    Dedup.appendIndexes(spark, dir, indexDir, docPredicate = col("doc_id") < 0L)
    val after = spark.read.parquet(s"$indexDir/jaccardPairs.parquet")
      .collect().map(_.toSeq).toSet
    assert(after == before, "empty append must not change the pair table")
    val sigs = spark.read.parquet(s"$indexDir/minhashSigs.parquet").count()
    assert(sigs == 4, "empty append must not add signature rows")
    Dedup.releaseIndexes(spark)
  }

  test("priming a persisted quantizer overrides an earlier in-session fit") {
    // Fit in-session first (populates the fit cache), then prime an
    // artifact carrying a DIFFERENT model: fitCentroids must serve the
    // artifact — a stale cached model would put probes and the primed
    // cell index in different cell geometries.
    val indexDir = java.nio.file.Files.createTempDirectory("graft-idx-fitwin").toString
    Dedup.writeIndexes(spark, dir, indexDir)
    val inSession = SimilarityIvf.fitCentroids(spark, dir)
    // forge a distinguishable "other session's" model into the artifact
    val forged = inSession.map(_.map(_ + 1000.0))
    spark.createDataFrame(forged.zipWithIndex.map { case (c, i) => (i + 1, c) })
      .toDF("cell", "centroid").write.mode("overwrite")
      .parquet(s"$indexDir/ivfCentroidsFit.parquet")
    Dedup.releaseIndexes(spark)
    Dedup.primeIndexes(spark, dir, indexDir)
    assert(SimilarityIvf.fitCentroids(spark, dir) == forged,
      "primed artifact must override the in-session fitted model")
    Dedup.releaseIndexes(spark)
    SimilarityIvf.clearFitCache()
  }

  test("appendIndexes into a never-written index fails fast instead of seeding a batch-only index") {
    import org.apache.spark.sql.functions.col
    val emptyIdx = java.nio.file.Files.createTempDirectory("graft-idx-missing").toString
    val e = intercept[IllegalArgumentException] {
      Dedup.appendIndexes(spark, dir, emptyIdx, docPredicate = col("doc_id") >= 1L)
    }
    assert(e.getMessage.contains("writeIndexes first"))
    // and the embedding tier guards independently: doc artifacts
    // present, embedding artifacts absent
    val docOnlyIdx = java.nio.file.Files.createTempDirectory("graft-idx-doconly").toString
    Dedup.writeIndexes(spark, dir, docOnlyIdx, withEmbeddings = false)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.appendIndexes(spark, dir, docOnlyIdx,
        docPredicate = col("doc_id") >= 1L, embPredicate = Some(col("vec_id") >= 0L))
    }
    assert(e2.getMessage.contains("embBase"))
    Dedup.releaseIndexes(spark)
  }

  test("primeIndexes with missing artifacts is a no-op and builders still run") {
    val emptyDir = java.nio.file.Files.createTempDirectory("graft-idx-empty").toString
    Dedup.primeIndexes(spark, dir, emptyDir)
    val pairs = Dedup.jaccardPairs(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    Dedup.releaseIndexes(spark)
  }

  test("writeIndexes withEmbeddings=false skips the embedding artifacts") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft-idx-noemb").toString
    Dedup.writeIndexes(spark, dir, indexDir, withEmbeddings = false)
    assert(new java.io.File(s"$indexDir/docShingles.parquet").exists())
    Seq("embBase", "lshBuckets", "ivfCells", "ivfCentroidsFit", "ivfCellsFit",
      "labelCentroids")
      .foreach { a =>
        assert(!new java.io.File(s"$indexDir/$a.parquet").exists(),
          s"embedding artifact $a written despite withEmbeddings=false")
      }
    Dedup.releaseIndexes(spark)
  }

  test("appendIndexes rebuildPairs=false defers the pair table; a later rebuild equals the eager path") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end1"),
      (2L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end2"),
      (3L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11"),
      // the appended batch: a near-dup of doc 1 the pair table can
      // only know about after a rebuild
      (5L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end5"))
      .map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
    def mkDir(p: Long => Boolean): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-idx-defer").toString
      docs.filter(r => p(r._1)).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val dirOld = mkDir(_ <= 3)
    val dirFull = mkDir(_ => true)
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-defer-a").toString
    Dedup.writeIndexes(spark, dirOld, idx, withEmbeddings = false)
    val stale = spark.read.parquet(s"$idx/jaccardPairs.parquet")
      .collect().map(_.toSeq).toSet
    Dedup.releaseIndexes(spark)

    // Deferred append: per-doc artifacts grow, the pair artifact stays
    // the pre-append file — the cheap per-batch ingest posture.
    Dedup.appendIndexes(spark, dirFull, idx,
      docPredicate = col("doc_id") >= 5L, rebuildPairs = false)
    assert(spark.read.parquet(s"$idx/minhashSigs.parquet").count() == 4,
      "per-doc artifacts must include the appended batch")
    val deferred = spark.read.parquet(s"$idx/jaccardPairs.parquet")
      .collect().map(_.toSeq).toSet
    assert(deferred == stale, "deferred append must leave the pair artifact untouched")

    // The async refresh: rebuildPairTable derives from the appended
    // parquet artifacts and must equal a from-scratch full rebuild.
    Dedup.rebuildPairTable(spark, dirFull, idx)
    val refreshed = spark.read.parquet(s"$idx/jaccardPairs.parquet")
      .collect().map(_.toSeq).toSet
    assert(refreshed.exists(r => r.take(2) == Seq(1L, 5L)),
      "refreshed pair table must see the appended near-dup pair")
    val idxFull = java.nio.file.Files.createTempDirectory("graft-idx-defer-b").toString
    Dedup.releaseIndexes(spark)
    Dedup.writeIndexes(spark, dirFull, idxFull, withEmbeddings = false)
    val rebuilt = spark.read.parquet(s"$idxFull/jaccardPairs.parquet")
      .collect().map(_.toSeq).toSet
    assert(refreshed == rebuilt, "deferred-then-rebuild must equal the eager/full path")
    Dedup.releaseIndexes(spark)
  }

  test("appendIndexes with a batchId is idempotent: a retried append replaces its own partition") {
    import org.apache.spark.sql.functions.col
    // The operational hazard this pins: an ingest job that appended
    // some artifacts, failed, and was re-run. Without the batch-keyed
    // dynamic partition overwrite the retry double-appends the batch's
    // shingle rows and the re-derived pair table silently inflates
    // n_common; with it the retry must converge to the single-append
    // state artifact-by-artifact.
    val docs = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end1"),
      (2L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11"),
      (5L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end5"))
      .map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
    val rnd = new scala.util.Random(23)
    val emb = (0 until 40).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat), i % 5))
    def mkDir(docP: Long => Boolean, embP: Long => Boolean): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-idx-retry").toString
      docs.filter(r => docP(r._1)).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      emb.filter(r => embP(r._1)).toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      d
    }
    val dirOld = mkDir(_ <= 2, _ < 30)
    val dirFull = mkDir(_ => true, _ => true)
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-retry-a").toString
    Dedup.releaseIndexes(spark)
    Dedup.writeIndexes(spark, dirOld, idx)
    Dedup.releaseIndexes(spark)
    def appendOnce(): Unit = Dedup.appendIndexes(spark, dirFull, idx,
      docPredicate = col("doc_id") >= 5L,
      embPredicate = Some(col("vec_id") >= 30L),
      batchId = Some("ingest-0042"))
    appendOnce()
    def snapshot(): Map[String, Set[Seq[Any]]] = artifacts.map { a =>
      a -> spark.read.parquet(s"$idx/$a.parquet")
        .collect().map(_.toSeq).toSet
    }.toMap
    val first = snapshot()
    // the near-dup pair (1,5) exists exactly once, scored from exactly
    // one copy of each doc's shingles
    val pair1 = spark.read.parquet(s"$idx/jaccardPairs.parquet")
      .filter(col("id_a") === 1L && col("id_b") === 5L).collect()
    assert(pair1.length == 1, "appended near-dup pair missing")
    Dedup.releaseIndexes(spark)
    appendOnce() // the retry
    val second = snapshot()
    artifacts.foreach { a =>
      assert(second(a) == first(a),
        s"artifact $a: retried batch append must be a no-op, not a double-append")
    }
    Dedup.releaseIndexes(spark)
  }

  test("compactIndexes folds batch directories into one base, content-preserving") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end1"),
      (2L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end2"),
      (5L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11"),
      (6L, "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11"))
      .map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
    def mkDir(p: Long => Boolean): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-idx-compact").toString
      docs.filter(r => p(r._1)).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val dirOld = mkDir(_ <= 2)
    val dirMid = mkDir(_ <= 5)
    val dirFull = mkDir(_ => true)
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-compact-a").toString
    Dedup.releaseIndexes(spark)
    Dedup.writeIndexes(spark, dirOld, idx, withEmbeddings = false)
    Dedup.releaseIndexes(spark)
    Dedup.appendIndexes(spark, dirMid, idx, docPredicate = col("doc_id") === 5L,
      rebuildPairs = false, batchId = Some("b1"))
    Dedup.appendIndexes(spark, dirFull, idx, docPredicate = col("doc_id") === 6L,
      rebuildPairs = false, batchId = Some("b2"))
    def batchDirs(a: String): Seq[String] =
      new java.io.File(s"$idx/$a.parquet").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName).toSeq.sorted
    assert(batchDirs("docShingles") == Seq("batch_id=b1", "batch_id=b2", "batch_id=base"))
    val before = spark.read.parquet(s"$idx/docShingles.parquet").drop("batch_id")
      .collect().map(_.toSeq).toSet

    Dedup.compactIndexes(spark, idx)
    assert(batchDirs("docShingles") == Seq("batch_id=base"),
      "compaction must fold every batch directory into one base")
    val after = spark.read.parquet(s"$idx/docShingles.parquet").drop("batch_id")
      .collect().map(_.toSeq).toSet
    assert(after == before, "compaction must preserve artifact content")
    // the compacted index still serves: prime and read the pair chain
    Dedup.primeIndexes(spark, dirFull, idx)
    val shingles = Dedup.jaccardPairs(spark, dirFull)
    assert(shingles.inputFiles.exists(_.contains(idx)) ||
      spark.read.parquet(s"$idx/minhashSigs.parquet").count() == 4)
    Dedup.releaseIndexes(spark)

    // crash recovery: emulate a compaction that died between delete and
    // rename — artifact gone, completed staging present — by moving the
    // artifact aside; the next run must finish the rename first
    val art = new java.io.File(s"$idx/docShingles.parquet")
    val staged = new java.io.File(s"$idx/.compact-docShingles.parquet")
    assert(art.renameTo(staged))
    Dedup.compactIndexes(spark, idx)
    assert(art.exists() && !staged.exists(),
      "rerunning compaction must repair a delete-before-rename crash")
    val repaired = spark.read.parquet(s"$idx/docShingles.parquet").drop("batch_id")
      .collect().map(_.toSeq).toSet
    assert(repaired == before, "repaired artifact must carry the compacted content")
    Dedup.releaseIndexes(spark)
  }

  test("two concurrent keyed appends of distinct batches both land; pair rebuild sees both") {
    import org.apache.spark.sql.functions.col
    // At 100 TB, maintenance overlaps: two ingest jobs appending
    // DISTINCT batches race on the same indexDir. Batch-keyed appends
    // write disjoint batch_id directories, so both must land intact —
    // this pins it with genuinely concurrent appenders (barrier-started
    // threads), then a single deferred pair rebuild that must see both
    // batches' near-dup pairs.
    val docs = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end1"),
      (2L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11"),
      (5L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end5"),  // batch A: near-dup of 1
      (6L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 end6"))  // batch B: near-dup of 2
      .map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
    def mkDir(p: Long => Boolean): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-idx-race").toString
      docs.filter(r => p(r._1)).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val dirOld = mkDir(_ <= 2)
    val dirFull = mkDir(_ => true)
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-race-a").toString
    Dedup.releaseIndexes(spark)
    Dedup.writeIndexes(spark, dirOld, idx, withEmbeddings = false)
    Dedup.releaseIndexes(spark)

    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def appender(docId: Long, batch: String): Thread = {
      val t = new Thread(() => {
        try {
          barrier.await()
          Dedup.appendIndexes(spark, dirFull, idx,
            docPredicate = col("doc_id") === docId,
            rebuildPairs = false, batchId = Some(batch))
        } catch { case e: Throwable => errors.add(e) }
      })
      t.start(); t
    }
    val ts = Seq(appender(5L, "race-a"), appender(6L, "race-b"))
    ts.foreach(_.join(120000))
    assert(errors.isEmpty, s"concurrent appends must not fail: ${errors.peek()}")

    // both batches landed, exactly once each
    val counts = spark.read.parquet(s"$idx/docShingles.parquet")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L),
      s"both racing batches must land exactly once: $counts")
    // the deferred rebuild sees BOTH batches' pairs
    Dedup.releaseIndexes(spark)
    Dedup.primeIndexes(spark, dirFull, idx)
    Dedup.rebuildPairTable(spark, dirFull, idx)
    val pairs = spark.read.parquet(s"$idx/jaccardPairs.parquet")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)) && pairs.contains((2L, 6L)),
      s"pair rebuild must see both racing batches' near-dups: $pairs")
    Dedup.releaseIndexes(spark)
  }

  test("compactIndexes invalidates another session's primed listing; re-priming recovers") {
    import org.apache.spark.sql.functions.col
    // Maintenance and serving overlap daily at scale: a reader session
    // primed on the index holds a FILE LISTING pinned at read time
    // (the stream-static precedent), and compaction rewrites those
    // files. This pins the failure mode — the pinned reader errors on
    // its next read, it does not silently serve stale rows — and the
    // recovery protocol: releaseIndexes + primeIndexes in the reader.
    val docs = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end1"),
      (2L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11"),
      (5L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end5"))
      .map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
    def mkDir(p: Long => Boolean): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-idx-rdr").toString
      docs.filter(r => p(r._1)).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val dirOld = mkDir(_ <= 2)
    val dirFull = mkDir(_ => true)
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-rdr-a").toString
    Dedup.releaseIndexes(spark)
    Dedup.writeIndexes(spark, dirOld, idx, withEmbeddings = false)
    Dedup.releaseIndexes(spark)
    Dedup.appendIndexes(spark, dirFull, idx, docPredicate = col("doc_id") === 5L,
      rebuildPairs = false, batchId = Some("b1"))
    Dedup.releaseIndexes(spark)

    val reader = spark.newSession()
    Dedup.primeIndexes(reader, dirFull, idx)
    val pinned = Dedup.docShingles(reader, dirFull)
    assert(pinned.count() == 3, "primed reader serves the appended index")

    Dedup.compactIndexes(spark, idx) // rewrites every multi-batch artifact
    val failure = intercept[Throwable] { pinned.count() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(failure).exists(c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
        String.valueOf(c.getMessage).contains("FileNotFound") ||
        String.valueOf(c.getMessage).contains("does not exist")),
      s"pinned listing must fail loudly after compaction, got $failure")

    // the documented re-prime protocol recovers the reader
    Dedup.releaseIndexes(reader)
    Dedup.primeIndexes(reader, dirFull, idx)
    assert(Dedup.docShingles(reader, dirFull).count() == 3,
      "re-primed reader must serve the compacted artifact")
    Dedup.releaseIndexes(reader)
    Dedup.releaseIndexes(spark)
  }

  test("ingestSinceWatermark: mark-windowed keyed appends, exactly-once under re-covered windows") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end1"),
      (2L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11"),
      (5L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end5"),
      (6L, "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11"))
      .map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
    def mkDir(p: Long => Boolean): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-idx-wm").toString
      docs.filter(r => p(r._1)).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val dirOld = mkDir(_ <= 2)
    val dirFull = mkDir(_ => true)
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-wm-a").toString
    val mark = java.nio.file.Files.createTempDirectory("graft-idx-wm-m").toString + "/mark"
    Dedup.releaseIndexes(spark)
    Dedup.writeIndexes(spark, dirOld, idx, withEmbeddings = false)
    Dedup.releaseIndexes(spark)

    // an unseeded first run must refuse rather than re-append the corpus
    val e = intercept[IllegalArgumentException] {
      Dedup.ingestSinceWatermark(spark, dirFull, idx, mark, newMark = 5L)
    }
    assert(e.getMessage.contains("seed"))
    graft.sources.WatermarkStore.write(mark, "2") // writeIndexes covered ids <= 2

    Dedup.ingestSinceWatermark(spark, dirFull, idx, mark, newMark = 5L)
    assert(graft.sources.WatermarkStore.read(mark).contains("5"))
    def shingleDocs(): Set[Long] =
      spark.read.parquet(s"$idx/docShingles.parquet").drop("batch_id")
        .select("doc_id").as[Long].collect().toSet
    assert(shingleDocs() == Set(1L, 2L, 5L), "window (2,5] appends exactly doc 5")

    // a re-covered window: emulate the crash-before-mark-write retry by
    // resetting the mark — and retry with an ADVANCED newMark (new data
    // arrived before the rerun), the hazard that makes keying by the
    // window START load-bearing: both attempts open at stored mark 2,
    // so the wider retry OVERWRITES the crashed attempt's wm-from-2
    // directories instead of double-appending the (2,5] overlap
    graft.sources.WatermarkStore.write(mark, "2")
    Dedup.ingestSinceWatermark(spark, dirFull, idx, mark, newMark = 6L)
    assert(graft.sources.WatermarkStore.read(mark).contains("6"))
    val counts = spark.read.parquet(s"$idx/docShingles.parquet")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L),
      s"re-covered window with advanced newMark must not double-append: $counts")

    // same-mark rerun no-ops
    Dedup.ingestSinceWatermark(spark, dirFull, idx, mark, newMark = 6L)
    assert(shingleDocs() == Set(1L, 2L, 5L, 6L))
    // and a regressing mark fails fast
    val e2 = intercept[IllegalArgumentException] {
      Dedup.ingestSinceWatermark(spark, dirFull, idx, mark, newMark = 4L)
    }
    assert(e2.getMessage.contains("behind"))
    Dedup.releaseIndexes(spark)
  }

  test("appendIndexes batchId onto a legacy flat artifact fails fast instead of mixing layouts") {
    import org.apache.spark.sql.functions.col
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-legacy").toString
    // a flat (pre-partitioning) artifact, as older writeIndexes laid out
    Seq((1L, Seq("a b c"))).toDF("doc_id", "sh")
      .write.mode("overwrite").parquet(s"$idx/docShingles.parquet")
    val e = intercept[IllegalArgumentException] {
      Dedup.appendIndexes(spark, dir, idx,
        docPredicate = col("doc_id") >= 1L, batchId = Some("b1"))
    }
    assert(e.getMessage.contains("legacy flat layout"))
    // 'base' is reserved for the writeIndexes build, 'unbatched' for
    // the shared bare-append directory (a keyed overwrite there would
    // wipe previously bare-appended rows)
    Seq("base", "unbatched").foreach { reserved =>
      val e2 = intercept[IllegalArgumentException] {
        Dedup.appendIndexes(spark, dir, idx,
          docPredicate = col("doc_id") >= 1L, batchId = Some(reserved))
      }
      assert(e2.getMessage.contains("reserved") || e2.getMessage.contains(reserved))
    }
    Dedup.releaseIndexes(spark)
  }

  test("append onto a pre-IVF index skips the cell table instead of seeding a batch-only one") {
    import org.apache.spark.sql.functions.col
    val indexDir = java.nio.file.Files.createTempDirectory("graft-idx-preivf").toString
    Dedup.releaseIndexes(spark)
    Dedup.writeIndexes(spark, dir, indexDir)
    // emulate an index written before the IVF artifacts existed
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(): Unit
    }
    Seq("ivfCells", "ivfCellsFit", "ivfCentroidsFit").foreach { a =>
      rmTree(new java.io.File(s"$indexDir/$a.parquet"))
    }
    Dedup.releaseIndexes(spark)
    Dedup.appendIndexes(spark, dir, indexDir,
      docPredicate = col("doc_id") < 0L,
      embPredicate = Some(col("vec_id") >= 0L), rebuildPairs = false)
    assert(!new java.io.File(s"$indexDir/ivfCells.parquet").exists(),
      "an append must not seed a batch-only cell table — annIvf would " +
        "silently search only the batch's vectors")
    assert(!new java.io.File(s"$indexDir/ivfCellsFit.parquet").exists())
    // the non-IVF embedding artifacts still grew
    assert(spark.read.parquet(s"$indexDir/embBase.parquet").count() > 30,
      "embBase must still take the append")
    Dedup.releaseIndexes(spark)
  }

  test("maintenance lease: exclusive excludes appends and other exclusives, shared allows shared") {
    import org.apache.spark.sql.functions.col
    val indexDir = java.nio.file.Files.createTempDirectory("graft-idx-lease").toString
    Dedup.releaseIndexes(spark)
    Dedup.writeIndexes(spark, dir, indexDir)
    Dedup.releaseIndexes(spark)
    // the wired-in entry points enforce the contract, not just the
    // lease primitives: an append under exclusive maintenance and a
    // compaction under a live appender both fail fast
    IndexLease.withExclusive(spark, indexDir, "spec-exclusive") {
      intercept[IllegalStateException] {
        Dedup.appendIndexes(spark, dir, indexDir,
          docPredicate = col("doc_id") === 3L,
          rebuildPairs = false, batchId = Some("blocked"))
      }
      intercept[IllegalStateException] {
        IndexLease.withExclusive(spark, indexDir, "second") { fail("must not run") }
      }
    }
    IndexLease.withShared(spark, indexDir, "spec-appender") {
      intercept[IllegalStateException] { Dedup.compactIndexes(spark, indexDir) }
      intercept[IllegalStateException] { Dedup.writeIndexes(spark, dir, indexDir) }
      // appenders do not block each other — the two-racing-appenders
      // behavior this spec already pins stays legal under the lease
      IndexLease.withShared(spark, indexDir, "spec-appender-2") { () }
    }
    // every exit above released its file: maintenance now proceeds
    Dedup.compactIndexes(spark, indexDir)
    Dedup.releaseIndexes(spark)
  }

  test("maintenance lease: released on failure, stale leases reaped after the TTL") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft-idx-lease2").toString
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/.maintenance.lease")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashing body must not leave the lease behind
    intercept[RuntimeException] {
      IndexLease.withExclusive(spark, indexDir, "crasher") {
        throw new RuntimeException("boom")
      }
    }
    assert(!fs.exists(p), "lease must be released on the failure path")
    // a lease whose mtime is beyond the TTL belongs to a crashed owner:
    // reaped by the next claimant instead of deadlocking the directory
    fs.create(p, false).close()
    fs.setTimes(p, System.currentTimeMillis() - IndexLease.DefaultTtlMs - 60000, -1)
    var ran = false
    IndexLease.withExclusive(spark, indexDir, "taker") { ran = true }
    assert(ran, "stale lease must be taken over")
    // ...but a FRESH foreign lease is respected
    fs.create(p, false).close()
    intercept[IllegalStateException] {
      IndexLease.withExclusive(spark, indexDir, "late") { fail("must not run") }
    }
    fs.delete(p, false)
    // stale appender markers likewise reap instead of blocking forever
    val marker = new org.apache.hadoop.fs.Path(s"$indexDir/.append-dead-1.lease")
    fs.create(marker, false).close()
    fs.setTimes(marker, System.currentTimeMillis() - IndexLease.DefaultTtlMs - 60000, -1)
    IndexLease.withExclusive(spark, indexDir, "after-dead-appender") { ran = true }
    assert(!fs.exists(marker), "stale appender marker must be reaped")
  }
}
