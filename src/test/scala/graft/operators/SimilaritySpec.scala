package graft.operators

import graft.SparkSpec

/** Pins the LSH approximate-nearest-neighbor semantics against the
  * exact brute-force baseline on the real sf0.001 embeddings. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val exact = Similarity.knnExact(spark, sf("sf0.001"))
    .select("query_id", "neighbor_id", "cos", "rn")
    .as[(Long, Long, Double, Int)].collect()

  private lazy val lsh = Similarity.annLsh(spark, sf("sf0.001"))
    .select("query_id", "neighbor_id", "cos", "rn")
    .as[(Long, Long, Double, Int)].collect()

  test("int8 quantization: range bounded, max-abs lane saturates exactly") {
    val rows = Similarity.quantizeEmbeddings(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qmin, qmax, nSat) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(qmin >= -127 && qmax <= 127)
      if (qmin != 0L || qmax != 0L) {
        // the element with |v| = scale quantizes to exactly ±127
        assert(qmax == 127L || qmin == -127L, s"vec ${r.getLong(0)} never saturates")
        assert(nSat >= 1L)
      }
    }
  }

  test("knnExact returns k=5 ranked neighbors per query, cos non-increasing") {
    val byQuery = exact.groupBy(_._1)
    assert(byQuery.size == 10)
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rows.length))
      val cs = sorted.map(_._3)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  // 40 seeded random vectors; vecs 1, 3, 7 get a near-copy planted at
  // 21, 23, 27 (tiny perturbation → cos ≈ 1). Each ANN variant must
  // surface the planted copy as its query's top neighbor.
  private lazy val plantedDir: String = {
    val rnd = new scala.util.Random(123)
    def randVec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(i => (i.toLong, randVec(), i % 10))
    val planted = Seq(1, 3, 7).map { i =>
      val src = base(i)._2
      ((20 + i).toLong, src.map(x => x + 0.01f * rnd.nextGaussian().toFloat), i % 10)
    }
    val rows = (base.filterNot(r => Seq(21L, 23L, 27L).contains(r._1)) ++ planted)
      .map { case (id, v, l) => (id, v.toSeq, l) }
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def assertPlantedRecovered(name: String,
      out: Array[(Long, Long, Int)]): Unit =
    Seq((1L, 21L), (3L, 23L), (7L, 27L)).foreach { case (q, n) =>
      val top = out.filter(r => r._1 == q && r._3 == 1).map(_._2).toSeq
      assert(top == Seq(n), s"$name query $q: expected planted copy $n first, got $top")
    }

  test("aggregator top-k equals the window top-k (partial-aggregation formulation)") {
    val agg = Similarity.knnExactAgg(spark, sf("sf0.001"))
      .select("query_id", "neighbor_id", "cos", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(agg.toSeq == exact.toSeq)
  }

  test("LSH recovers planted near-duplicate neighbors (fixture embeddings)") {
    assertPlantedRecovered("lsh", Similarity.annLsh(spark, plantedDir)
      .select("query_id", "neighbor_id", "rn").as[(Long, Long, Int)].collect())
  }

  test("multi-probe LSH recovers planted neighbors; recall never below single-probe") {
    assertPlantedRecovered("lsh_probe", Similarity.annLshMultiProbe(spark, plantedDir)
      .select("query_id", "neighbor_id", "rn").as[(Long, Long, Int)].collect())
    // recall vs the exact top-k is monotone in the candidate set (the
    // rerank is exact cosine), and multi-probe's candidates are a
    // superset of annLsh's — so this can only tie or improve.
    val truth = exact.map(r => (r._1, r._2)).toSet
    def recall(out: Seq[(Long, Long)]): Double =
      out.count(truth).toDouble / truth.size
    val multi = Similarity.annLshMultiProbe(spark, sf("sf0.001"))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    val single = lsh.map(r => (r._1, r._2)).toSeq
    assert(recall(multi) >= recall(single), "multi-probe lost recall vs single-probe")
  }

  test("IVF recovers planted near-duplicate neighbors (fixture embeddings)") {
    assertPlantedRecovered("ivf", SimilarityIvf.annIvf(spark, plantedDir)
      .select("query_id", "neighbor_id", "rn").as[(Long, Long, Int)].collect())
  }

  test("fitted-centroid IVF recovers planted neighbors; fit is deterministic") {
    assertPlantedRecovered("ivf_fit", SimilarityIvf.annIvfFitted(spark, plantedDir)
      .select("query_id", "neighbor_id", "rn").as[(Long, Long, Int)].collect())
    val f1 = SimilarityIvf.fitCentroids(spark, sf("sf0.001"))
    val f2 = SimilarityIvf.fitCentroids(spark, sf("sf0.001"))
    assert(f1 == f2, "hash-ordered sample + Lloyd must be reproducible")
    // corpus-proportional sizing: k = 4·⌈√N⌉ (N=500 → 92), nprobe k/8
    val expectedK = SimilarityIvf.corpusK(spark, sf("sf0.001"))
    assert(expectedK == 4 * math.ceil(math.sqrt(500.0)).toInt)
    assert(f1.length == expectedK && f1.forall(_.length == 64))
    assert(SimilarityIvf.probeFor(expectedK) == expectedK / 8)
  }

  test("MMR re-rank: first pick is the top-1, no repeats, picks stay in the pool") {
    val dir = sf("sf0.001")
    val mmr = Similarity.mmrRerank(spark, dir)
      .select("query_id", "pick_order", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    val byQ = mmr.groupBy(_._1)
    assert(byQ.values.forall(_.map(_._2).sorted.toSeq == (1 to 5)), "pick orders dense")
    // per query: pick 1 = relevance argmax (= exact top-1), all picks distinct
    val top1 = exact.filter(_._4 == 1).map(r => r._1 -> r._2).toMap
    byQ.foreach { case (q, picks) =>
      assert(picks.find(_._2 == 1).get._3 === top1(q), s"query $q pick-1")
      assert(picks.map(_._3).distinct.length === picks.length, s"query $q repeats")
    }
    // pool containment: every pick within the exact top-20
    val pool = Similarity.knnExact(spark, dir, 10, Similarity.MmrPoolN)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(mmr.forall(r => pool((r._1, r._3))), "pick outside the candidate pool")
  }

  test("MMR driver greedy: bit-identical to the distributed unroll") {
    val dir = sf("sf0.001")
    // the registered scale rides the driver greedy (pool under the
    // MmrDriverMaxPoolRows model-table ceiling); the forced call pins
    // the distributed unroll it replaced — scores must agree to the
    // BIT, not approximately (identical round arithmetic)
    def rows(forced: Boolean): Seq[(Long, Int, Long, Double)] =
      Similarity.mmrRerank(spark, dir, forceDistributed = forced)
        .select("query_id", "pick_order", "neighbor_id", "mmr_score")
        .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    assert(rows(forced = false) === rows(forced = true),
      "driver greedy diverges from the distributed unroll")
  }

  test("MMR degeneracy: relevance-only weights reproduce the plain exact top-k order") {
    // λ=1, penalty=0 removes the diversity term entirely — the greedy
    // argmax then IS the similarity ranking, pick for pick, which
    // pins the selection machinery against the hash-verified kNN leg
    val mmr = Similarity.mmrRerank(spark, sf("sf0.001"),
        lambdaRel = 1.0, penalty = 0.0)
      .select("query_id", "pick_order", "neighbor_id")
      .as[(Long, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val plain = exact.map(r => (r._1, r._4) -> r._2).toMap
    assert(mmr === plain, "relevance-only MMR diverged from the exact ranking")
  }

  test("MMR diversification: a planted near-copy pair cannot BOTH sit in the top picks") {
    // query 1's pool contains vec 21 (cos ~ 1 near-copy of the query
    // itself): after 21 is picked, any candidate nearly identical to
    // it pays ~0.3 penalty — verify the penalty actually moves picks
    // vs the plain similarity ranking
    val plain = Similarity.knnExact(spark, plantedDir, 10, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mmr = Similarity.mmrRerank(spark, plantedDir)
      .select("query_id", "pick_order", "neighbor_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(mmr.keySet === plain.keySet)
    // at least one query's diversified set must differ from the plain
    // top-5 (the penalty re-ordered something on this geometry)
    assert(mmr.exists { case (q, s) => s != plain(q) },
      "MMR never diverged from the plain ranking — penalty inert")
  }

  test("tuned probe budget reaches the 0.8 recall target on NATURAL queries") {
    val dir = sf("sf0.001")
    // natural serving queries (vec_id < 10), not planted duplicates —
    // the configuration the round-11 report measured at 0.58 under
    // the k/8 heuristic
    val truth = exact.map(r => (r._1, r._2)).toSet
    val tuned = SimilarityIvf.annIvfTuned(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = truth.intersect(tuned).size.toDouble / truth.size
    info(s"tuned mean recall@5 on natural queries: $recall " +
      s"(nprobe=${SimilarityIvf.tunedProbe(spark, dir)})")
    assert(recall >= 0.8, s"tuned recall $recall below the 0.8 target")
    // the tuner must actually have raised the budget past the k/8
    // heuristic iff the heuristic missed the target (ladder semantics:
    // chosen is the first rung that clears it)
    val kCells = SimilarityIvf.corpusK(spark, dir)
    assert(SimilarityIvf.tunedProbe(spark, dir) >= SimilarityIvf.probeFor(kCells))
    // deterministic: same session, same answer (memoized), and the
    // ladder is data-derived so a fresh derivation agrees
    assert(SimilarityIvf.tunedProbe(spark, dir) == SimilarityIvf.tunedProbe(spark, dir))
  }

  test("filtered ANN: predicate holds on every row, recall vs post-filter exact twin") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val out = SimilarityIvf.annIvfFiltered(spark, dir)
      .select("query_id", "neighbor_id", "cos", "rn")
      .as[(Long, Long, Double, Int)].collect()
    assert(out.nonEmpty)
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)].collect()
    val allowed = emb.filter(_._3 < SimilarityIvf.FilterLabelMax).map(_._1).toSet
    assert(out.forall(r => allowed(r._2)),
      "filtered ANN returned an out-of-predicate neighbor")
    // post-filter exact twin: brute-force cosine top-5 over the allowed
    // slice (zero-norm vectors excluded, the embBase rule)
    def nrm(v: Seq[Float]): Double = math.sqrt(v.map(x => x.toDouble * x).sum)
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum / (nrm(a) * nrm(b))
    val vecs = emb.map(r => r._1 -> r._2).toMap
    val truth = (0L until 10L).filter(q => vecs.contains(q) && nrm(vecs(q)) > 0)
      .flatMap { q =>
        emb.filter(r => allowed(r._1) && r._1 != q && nrm(r._2) > 0)
          .map(r => (r._1, cos(vecs(q), r._2)))
          .sortBy { case (id, c) => (-c, id) }
          .take(5).map { case (id, _) => (q, id) }
      }.toSet
    val got = out.map(r => (r._1, r._2)).toSet
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(s"filtered-ANN recall@5 vs post-filter exact: $recall")
    assert(recall >= 0.8, s"filtered ANN recall $recall below 0.8")
  }

  test("filtered ANN holds recall >= 0.8 across planted selectivities; probe budget scales with the histogram") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)].collect()
    def nrm(v: Seq[Float]): Double = math.sqrt(v.map(x => x.toDouble * x).sum)
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum / (nrm(a) * nrm(b))
    val vecs = emb.map(r => r._1 -> r._2).toMap
    val k = SimilarityIvf.corpusK(spark, dir)
    // selectivities from ultra-selective (1 label) to everything: the
    // budget must come from the OBSERVED histogram, and recall must
    // hold at each point — the property the old fixture-arity constant
    // could only promise at one point
    val labelArity = emb.map(_._3).distinct.length
    var prevProbes = Int.MaxValue
    Seq(1, 3, 5, labelArity).foreach { labelMax =>
      val probes = SimilarityIvf.probeForFiltered(spark, dir, k, labelMax)
      // monotone: a more selective predicate never probes fewer cells
      assert(probes <= prevProbes,
        s"probe budget must not grow with selectivity: labelMax=$labelMax probes=$probes prev=$prevProbes")
      prevProbes = probes
      val out = SimilarityIvf.annIvfFiltered(spark, dir, labelMax = labelMax)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val allowed = emb.filter(_._3 < labelMax).map(_._1).toSet
      assert(out.forall(p => allowed(p._2)), s"out-of-predicate neighbor at labelMax=$labelMax")
      val truth = (0L until 10L).filter(q => vecs.contains(q) && nrm(vecs(q)) > 0)
        .flatMap { q =>
          emb.filter(r => allowed(r._1) && r._1 != q && nrm(r._2) > 0)
            .map(r => (r._1, cos(vecs(q), r._2)))
            .sortBy { case (id, c) => (-c, id) }
            .take(5).map { case (id, _) => (q, id) }
        }.toSet
      val recall = out.intersect(truth).size.toDouble / math.max(truth.size, 1)
      info(s"labelMax=$labelMax probes=$probes recall=$recall")
      assert(recall >= 0.8, s"recall $recall < 0.8 at labelMax=$labelMax (probes=$probes)")
    }
    graft.operators.Dedup.releaseIndexes(spark)
  }

  test("IVF ranks are dense, scores agree with exact cosine on shared pairs") {
    val ivf = SimilarityIvf.annIvf(spark, sf("sf0.001"))
      .select("query_id", "neighbor_id", "cos", "rn")
      .as[(Long, Long, Double, Int)].collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
    }
    val exactCos = exact.map(r => (r._1, r._2) -> r._3).toMap
    ivf.foreach { case (q, n, c, _) =>
      exactCos.get((q, n)).foreach(e => assert(math.abs(e - c) < 1e-12))
    }
  }

  test("LSH cosine scores agree with the exact computation on shared pairs") {
    val exactCos = exact.map(r => (r._1, r._2) -> r._3).toMap
    lsh.foreach { case (q, n, c, _) =>
      exactCos.get((q, n)).foreach(e => assert(math.abs(e - c) < 1e-12))
    }
  }

  test("LSH candidate set never contains self-pairs and ranks are dense") {
    assert(lsh.forall { case (q, n, _, _) => q != n })
    lsh.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
    }
  }

  test("zero-norm vectors are excluded from cosine ranking; heap equals aggregator") {
    // vec 2 (a query id) and vec 50 (a corpus vector) are all-zero:
    // their cosine is 0/0 — a DIVIDE_BY_ZERO error under ANSI mode
    // (the Spark 4 default) — so every similarity operator must
    // exclude them from scoring instead of crashing the query.
    val rnd = new scala.util.Random(31)
    val rows = (0 until 12).map { i =>
      val v = if (i == 2) Seq.fill(64)(0f)
              else Seq.fill(64)(rnd.nextGaussian().toFloat)
      (i.toLong, v, i % 3)
    } :+ (50L, Seq.fill(64)(0f), 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-zero").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "cos", "rn")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val heap = run(Similarity.knnExact(spark, dir, nQueries = 3, k = 4))
    val agg = run(Similarity.knnExactAgg(spark, dir, nQueries = 3, k = 4))
    assert(heap == agg, "heap prune and aggregator diverge")
    assert(heap.nonEmpty)
    assert(heap.forall(t => t._1 != 2L && t._2 != 2L && t._2 != 50L),
      "zero-norm vectors must appear on neither side of the ranking")
    val lsh = run(Similarity.annLsh(spark, dir, nQueries = 3, k = 4))
    assert(lsh.forall(t => t._1 != 2L && t._2 != 2L && t._2 != 50L))
  }

  test("fitCentroids handles tables smaller than k and rejects empty ones") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 3).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat), i))
    val dir = java.nio.file.Files.createTempDirectory("graft-tiny").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val fit = SimilarityIvf.fitCentroids(spark, dir)
    assert(fit.length == 3 && fit.forall(_.length == 64),
      "3-row table must fit 3 cells, not crash indexing centroids(3)")
    val out = SimilarityIvf.annIvfFitted(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(out.nonEmpty && out.forall { case (q, n) => q != n })

    val emptyDir = java.nio.file.Files.createTempDirectory("graft-empty-emb").toString
    rows.toDF("vec_id", "embedding", "label").limit(0)
      .write.mode("overwrite").parquet(s"$emptyDir/embeddings.parquet")
    intercept[IllegalArgumentException] {
      SimilarityIvf.fitCentroids(spark, emptyDir)
    }
  }

  test("label centroids match a driver-side element-wise mean") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val got = Similarity.labelCentroids(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val raw = graft.sources.Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
    val dims = raw.head._2.length
    raw.groupBy(_._1).foreach { case (label, rows) =>
      (0 until dims).foreach { pos =>
        // differential vs plain double accumulation: the decimal-sum
        // path must agree with the naive mean to well under the
        // 1e-6 rounding grain
        val mean = rows.map(_._2(pos).toDouble).sum / rows.length
        assert(math.abs(got((label, pos)) - mean) < 1e-6,
          s"label $label pos $pos: ${got((label, pos))} vs $mean")
      }
    }
    assert(got.size == raw.map(_._1).distinct.length * dims)
  }

  test("embedding outliers surface a planted anti-centroid vector first") {
    // label 0: eight near-copies of a base direction plus one planted
    // inversion (id 99). The centroid tracks the base direction, so
    // the inverted vector's cosine to it is ≈ -1 → it must rank rn=1;
    // every clean vector stays on the positive side.
    val rnd = new scala.util.Random(7)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    def near() = base.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val rows = (0 until 8).map(i => (i.toLong, near().toSeq, 0)) :+
      (99L, base.map(-_).toSeq, 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-out").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.embeddingOutliers(spark, dir)
      .select("label", "vec_id", "cos_centroid", "rn")
      .as[(Int, Long, Double, Int)].collect()
    assert(out.length == 5, "bottom-5 per label")
    assert(out.map(_._4).sorted.toSeq == (1 to 5), "dense ranks")
    val top = out.find(_._4 == 1).get
    assert(top._2 == 99L && top._3 < -0.9,
      s"planted inversion must rank first, got $top")
    assert(out.filter(_._2 != 99L).forall(_._3 > 0.5),
      "clean near-copies stay close to the centroid")
    // cosine to own centroid is a true cosine: bounded
    assert(out.forall(r => r._3 >= -1.0 && r._3 <= 1.0))
  }

  test("ivfStats accounts for every indexed vector, share sums to 1, skew centers at 1") {
    val dir = sf("sf0.001")
    val stats = SimilarityIvf.ivfStats(spark, dir)
      .select("cell", "n_vecs", "share", "skew", "min_vec_id", "max_vec_id")
      .as[(Int, Long, Double, Double, Long, Long)].collect()
    val base = Similarity.embBase(spark, dir).count()
    assert(stats.map(_._2).sum == base, "every norm-filtered vector is in exactly one cell")
    assert(math.abs(stats.map(_._3).sum - 1.0) < 1e-3, "shares partition the corpus")
    stats.foreach { s =>
      assert(math.abs(s._4 - s._3 * SimilarityIvf.NumCentroids) < 1e-4,
        s"skew is share x K: $s")
      assert(s._5 <= s._6, s"min <= max vec_id: $s")
    }
    graft.operators.Dedup.releaseIndexes(spark)
  }

  test("prototypePrune drops exactly the top floor(frac·n) most prototypical of each cell") {
    val dir = sf("sf0.001")
    val scores = SimilarityIvf.prototypeScores(spark, dir)
      .as[(Int, Long, Double)].collect()
    val dropped = SimilarityIvf.prototypePrune(spark, dir)
      .select("cell", "vec_id", "proto_cos", "cell_rank", "cell_n")
      .as[(Int, Long, Double, Int, Long)].collect()
    val byCell = scores.groupBy(_._1)
    dropped.groupBy(_._1).foreach { case (cell, rows) =>
      val members = byCell(cell)
      val quota = math.floor(SimilarityIvf.PrototypeFrac * members.length).toLong
      assert(rows.length == quota, s"cell $cell: ${rows.length} != floor quota $quota")
      assert(rows.forall(_._5 == members.length), s"cell_n must be the cell size")
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length), "dense ranks")
      // the drop list IS the top of the (rounded cos desc, vec_id) order
      val expect = members.sortBy(m => (-m._3, m._2)).take(quota.toInt).map(_._2).toSet
      assert(rows.map(_._2).toSet == expect, s"cell $cell drop set mismatch")
    }
    // every cell with quota ≥ 1 contributes
    byCell.foreach { case (cell, members) =>
      val quota = math.floor(SimilarityIvf.PrototypeFrac * members.length).toLong
      assert(dropped.count(_._1 == cell) == quota, s"cell $cell missing from drops")
    }
    graft.operators.Dedup.releaseIndexes(spark)
  }
  test("hybrid RRF: bounded scores, per-query monotone ranking, both legs contribute") {
    val out = Similarity.hybridRrf(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.map(_._1).distinct.length == 10, "all 10 queries must return rows")
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
        s"rrf must be non-increasing in rank: ${sorted.mkString(";")}")
    }
    // max possible fusion = top-1 in both legs = 2/61; min > 0
    assert(out.forall(r => r._3 > 0 && r._3 <= math.ceil(2.0 / 61 * 1e6) / 1e6))
    // the dense leg alone caps at 1/61 < the observed top scores only if
    // some neighbor scores in BOTH legs - assert fusion actually fuses
    assert(out.exists(_._3 > 1.0 / 61 + 1e-9),
      "no neighbor scored in both legs - fusion degenerated to one leg")
    graft.operators.Dedup.releaseIndexes(spark)
  }
  test("int8-domain ANN agrees closely with the full-precision exact scan") {
    // Quantized-cosine ranking must recall most exact top-5 neighbors,
    // and every reported quantized cosine must sit near the true one
    // (127-level symmetric quantization of 64-dim gaussians).
    val exact = Similarity.knnExact(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sq8 = Similarity.knnSq8(spark, sf("sf0.001")).collect()
    val hits = sq8.count(r => exact.contains((r.getLong(0), r.getLong(1))))
    assert(hits >= 40, s"recall collapsed: $hits/50")
    sq8.foreach { r =>
      exact.get((r.getLong(0), r.getLong(1))).foreach { trueCos =>
        assert(math.abs(r.getDouble(2) - trueCos) < 0.02,
          s"quantized cosine drifted: $r vs $trueCos")
      }
    }
  }

  test("IVF-pruned int8 ANN: pruning selects, int8 scores — pairs subset-scored identically to the full scan") {
    // The corpus-linear sq8 scan vs its IVF-pruned twin: every pair
    // BOTH serve must carry the identical quantized cosine (pruning
    // changes WHICH pairs are scored, never a score), recall vs the
    // full scan stays above the tuned probe budget's audited floor,
    // and ranks are dense per query.
    val dir = sf("sf0.001")
    val full = Similarity.knnSq8(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pruned = Similarity.knnIvfSq8(spark, dir).collect()
    pruned.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to rows.length),
        s"ranks not dense for query $q")
    }
    var shared = 0
    pruned.foreach { r =>
      full.get((r.getLong(0), r.getLong(1))).foreach { cosFull =>
        shared += 1
        assert(r.getDouble(2) === cosFull,
          s"pruned int8 cosine diverged from full scan: $r vs $cosFull")
      }
    }
    val recall = shared.toDouble / full.size
    info(f"ivf_sq8 recall vs full sq8 scan: $recall%.3f ($shared/${full.size})")
    // the tuned probe budget reaches >= 0.8 recall on held-out natural
    // queries; allow slack for the serving-query sample
    assert(recall >= 0.5, f"IVF pruning collapsed int8 recall: $recall%.3f")
  }

  test("join-based probe head (k past the literal cutoff) matches the literal probe semantics") {
    // Past LiteralProbeMaxK cells queryProbesOf switches from the
    // literal centroid expression to a broadcast-join + window plan;
    // the cells served must be BIT-identical (same dots, same
    // dt-desc/cell-desc tie order). Verified against an independent
    // driver-side replay of the literal semantics, not against the
    // other code path.
    val dir = sf("sf0.001")
    val cents = SimilarityIvf.fitCentroids(spark, dir, k = 300)
    assert(cents.length === 300, s"need k past the cutoff: ${cents.length}")
    val qb = Similarity.embBase(spark, dir).filter("vec_id < 10")
    val got = SimilarityIvf.queryProbesOf(qb, cents, nprobe = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = qb.select("vec_id", "v").collect().flatMap { r =>
      val id = r.getLong(0)
      // v is the raw float array; ArrayDotProduct promotes per element
      val v = r.getSeq[Float](1).map(_.toDouble)
      cents.zipWithIndex.map { case (c, i) =>
        var s = 0.0; var j = 0
        while (j < v.length) { s += v(j) * c(j); j += 1 }
        (s, i + 1)
      }.sortBy { case (d, cell) => (-d, -cell) }.take(5).map(p => (id, p._2))
    }.toSet
    assert(got === want, "join probe head diverged from literal probe semantics")
  }

  test("ANN recall report: bounded per query, and honest about natural-query recall") {
    val out = SimilarityIvf.annRecallReport(spark, sf("sf0.01")).collect()
    assert(out.length === 10)
    assert(out.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= 5L))
    // Natural queries over i.i.d. gaussian vectors are ANN's hardest
    // case (near-uniform cosines, true neighbors scattered across
    // cells) — measured mean ≈ 0.58 at nprobe = k/8, against the ≥0.8
    // the PLANTED-duplicate pins achieve. That gap is exactly what
    // this report exists to surface for a probe-budget decision; pin
    // a floor well above chance (top-5 of ~1k ≈ 0.005) but below the
    // planted ceiling.
    val mean = out.map(_.getDouble(2)).sum / out.length
    assert(mean >= 0.3 && mean <= 1.0, s"mean recall@5 $mean outside [0.3, 1]")
  }
}
