package graft.operators

import graft.SparkSpec

/** Product-quantization pins: model determinism, code-table shape, and
  * the recall of the compressed-domain shortlist against the exact
  * scan — the quality bound the 64× storage compression buys. */
class PqSpec extends SparkSpec {

  test("codebook fit is deterministic and M x K x SubDim shaped") {
    val a = SimilarityPq.fitCodebooks(spark, sf("sf0.001"))
    SimilarityPq.clearFitCache()
    val b = SimilarityPq.fitCodebooks(spark, sf("sf0.001"))
    assert(a == b, "two fits on the same corpus must be identical")
    assert(a.length == SimilarityPq.NumSub)
    assert(a.forall(_.length == SimilarityPq.NumCodes))
    assert(a.forall(_.forall(_.length == SimilarityPq.SubDim)))
  }

  test("code table carries one small code per subspace for every vector") {
    val codes = SimilarityPq.pqCodes(spark, sf("sf0.001")).collect()
    val nVecs = Similarity.embBase(spark, sf("sf0.001")).count()
    assert(codes.length.toLong == nVecs, "every vector must be encoded")
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == SimilarityPq.NumSub)
      assert(cs.forall(c => c >= 1 && c <= SimilarityPq.NumCodes),
        s"code out of range: $cs")
    }
  }

  test("ADC shortlist + exact rerank recalls the exact top-k") {
    // Recall@5 of the reranked PQ pipeline vs the brute-force scan.
    // 8 subspaces x 16 codes on 64-dim gaussian embeddings is a coarse
    // 4-bit-per-subspace model; the 32-candidate rerank recovers most
    // of the exact neighbors. The bound is a conservative floor well
    // above chance (5/60000) — a regression to random or a broken
    // LUT/encode join lands far below it.
    val exact = Similarity.knnExact(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SimilarityPq.knnPqRerank(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect pq).size.toDouble / exact.size
    info(f"PQ rerank recall@5 vs exact: $recall%.3f")
    assert(recall >= 0.5, f"recall collapsed: $recall%.3f")
  }

  test("IVFADC + refine lifts raw IVFADC recall and serves exact cosines") {
    // The refined path (tuned probe budget + tuned-shortlist exact
    // rerank) exists BECAUSE the recall report measured raw ivfpq at
    // 0.12 natural recall: pin that refine is a strict improvement on
    // this corpus and well above chance, and that what it serves are
    // full-precision cosines (every refined pair's score equals the
    // brute-force exact scan's score for that pair — the compressed
    // domain only selects, never scores, the final ranking).
    val dir = sf("sf0.001")
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.knnExact(spark, dir).collect()
    val exactPairs = pairs(exact)
    val raw = pairs(SimilarityPq.knnIvfPq(spark, dir).collect())
    val refinedRows = SimilarityPq.knnIvfPqRefined(spark, dir).collect()
    val refined = pairs(refinedRows)
    val rawRecall = (exactPairs intersect raw).size.toDouble / exactPairs.size
    val refRecall = (exactPairs intersect refined).size.toDouble / exactPairs.size
    info(f"ivfpq recall@5: raw $rawRecall%.3f -> refined $refRecall%.3f")
    assert(refRecall >= rawRecall,
      f"refine must not lose recall: $rawRecall%.3f -> $refRecall%.3f")
    assert(refRecall >= 0.5, f"refined recall collapsed: $refRecall%.3f")
    // exact-cosine parity on the pairs both rankings share
    val exactCos = exact.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    refinedRows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactCos.get(key).foreach { c =>
        assert(math.abs(c - r.getDouble(2)) < 1e-6,
          s"refined cos diverged from exact for $key: $c vs ${r.getDouble(2)}")
      }
    }
  }

  test("IVFADC scores agree with the exhaustive ADC scan on shared pairs") {
    // IVF pruning changes WHICH pairs are scored, never their score:
    // every (query, neighbor) the IVFADC path returns must carry the
    // same rounded ADC score the exhaustive compressed-domain scan
    // assigns the pair. A divergence means the candidate join read a
    // different code or LUT row.
    val full = SimilarityPq.knnPq(spark, sf("sf0.001"), k = 1000000).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = SimilarityPq.knnIvfPq(spark, sf("sf0.001")).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(full.contains(key), s"IVFADC returned a pair absent from the corpus scan: $key")
      assert(full(key) == r.getDouble(2),
        s"ADC score diverged for $key: ${full(key)} vs ${r.getDouble(2)}")
    }
  }
}
