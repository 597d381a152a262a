package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Product quantization for nearest-neighbor search (Jégou, Douze,
  * Schmid — TPAMI 2011): the embedding space is split into M
  * orthogonal subspaces, each sub-vector quantized against its own
  * K-codeword codebook, and a vector is stored as M small codes —
  * here 8 subspaces × 16 codes = 8 four-bit codes for a 64-dim float
  * vector, a 64× compression of the stored representation. Queries
  * score candidates by ASYMMETRIC DISTANCE COMPUTATION (ADC): the
  * query stays un-quantized, a per-query lookup table of
  * subspace-dot-products against every codeword is built once
  * (M·K = 128 doubles), and each candidate's approximate inner
  * product is M table lookups + adds instead of a 64-dim dot product.
  *
  * 100 TB posture: the codebooks are a train-once model (the IVF
  * coarse-quantizer discipline — fitted on a deterministic sample,
  * persisted with the index, appends encode under the PERSISTED
  * model); the code table is a maintained per-vector artifact 64×
  * smaller than the raw vectors, so the scoring scan reads bytes, not
  * floats; the per-query LUT rides a 10-row broadcast and scoring is
  * one narrow projection over the code table — no shuffle at all
  * until the per-query top-k.
  *
  * Engine parity: codebook fitting is driver-side deterministic
  * k-means (md5-ordered sample, fixed iterations); encode/score plans
  * consume the model as literals, so the DuckDB oracle replays the
  * whole pipeline — encoding argmax, LUT, ADC ranking — from the same
  * literals (the q_knn_ivf_fit discipline). Per-(query, subspace,
  * code) LUT weights round to 9 dp and sum as DECIMAL, making the
  * ADC score independent of addition order in both engines.
  */
object SimilarityPq {
  import Similarity.{NumQueriesDefault, TopKDefault}

  private def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDotProduct(a, b)

  private[operators] val NumSub = 8
  private[operators] val SubDim = 8
  private[operators] val NumCodes = 16

  /** ADC candidates kept for the exact-cosine rerank pass. */
  private[operators] val RerankCands = 32

  /** Cached per-(session, dir) codebook fits — M×K×SubDim doubles,
    * negligible; same lifecycle as the IVF fitCache. */
  private val fitCache =
    graft.sources.SessionSweep.scoped(new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Seq[Double]]]]())

  private[operators] def clearFitCache(): Unit = fitCache.clear()

  /** Artifact-wins invalidation — see SimilarityIvf.invalidateFit. */
  private[operators] def invalidateFit(spark: SparkSession, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val prefix = s"${Dedup.sessionKey(spark)}|$dir"
    fitCache.keySet.asScala.filter(_.startsWith(prefix)).foreach(fitCache.remove)
  }

  /** Lloyd's k-means on pre-sliced sub-vectors — the same loop,
    * tie-break (first minimum), and empty-cluster reseed as the IVF
    * coarse-quantizer fit, at sub-vector dimensionality. */
  private def kmeans(sample: Array[Array[Double]], kEff: Int,
                     iters: Int): Seq[Seq[Double]] = {
    var centroids: Array[Array[Double]] = sample.take(kEff).map(_.clone())
    (1 to iters).foreach { _ =>
      val sums = Array.fill(kEff)(new Array[Double](centroids(0).length))
      val counts = new Array[Long](kEff)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kEff) {
          var d = 0.0; var i = 0
          while (i < v.length) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = (0 until kEff).map { c =>
        if (counts(c) == 0) sample(c % sample.length).clone()
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids.map(_.toSeq).toSeq
  }

  /** Train the M per-subspace codebooks on the SAME deterministic
    * md5-ordered sample draw as the IVF fit (one sample ships to the
    * driver; each subspace clusters its slice of it). A session primed
    * from parquet serves the persisted model instead of refitting —
    * codes and LUTs must live in one codebook geometry. */
  private[operators] def fitCodebooks(spark: SparkSession, dir: String,
                                      iters: Int = 5): Seq[Seq[Seq[Double]]] = {
    val key = s"${Dedup.sessionKey(spark)}|$dir"
    val hit = fitCache.get(key)
    if (hit != null) return hit
    Dedup.memoGet(spark, s"pqCodebooksFit|$dir").foreach { df =>
      val rows = df.orderBy("m", "code").collect()
      if (rows.nonEmpty) {
        val cbs = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map(_._2
          .sortBy(_.getInt(1))
          .map(r => r.getSeq[Double](r.fieldIndex("codeword")).toSeq).toSeq)
        fitCache.put(key, cbs)
        return cbs
      }
    }
    val sampleEff = math.max(512, 16 * NumCodes)
    val sample = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      .limit(sampleEff)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(sample.nonEmpty, s"cannot fit PQ codebooks: $dir/embeddings is empty")
    val out = (0 until NumSub).map { m =>
      val slices = sample.map(v =>
        java.util.Arrays.copyOfRange(v, m * SubDim, (m + 1) * SubDim))
      kmeans(slices, math.min(NumCodes, slices.length), iters)
    }
    fitCache.put(key, out)
    out
  }

  /** ‖c‖²/2, precomputed driver-side and inlined as ONE literal on
    * both engine sides — argmin‖v−c‖² ≡ argmax(v·c − ‖c‖²/2), the
    * dot-product form both engines evaluate identically. */
  private[operators] def halfNorm(c: Seq[Double]): Double =
    c.map(x => x * x).sum / 2

  private[operators] def subCol(v: Column, m: Int): Column =
    slice(v, m * SubDim + 1, SubDim)

  /** Per-subspace encode scores: v_m·c − ‖c‖²/2 for every codeword. */
  private def scoreArray(v: Column, cb: Seq[Seq[Double]], m: Int): Column =
    array(cb.map(c => dot(subCol(v, m), typedLit(c)) - lit(halfNorm(c))): _*)

  private def codesFromScores(staged: DataFrame): DataFrame =
    staged.select(col("vec_id"),
      array((0 until NumSub).map(m =>
        array_position(col(s"s$m"), array_max(col(s"s$m"))).cast("int")): _*)
        .as("codes"))

  /** Row-wise PQ encoding of an arbitrary (vec_id, v, …) base slice
    * under a FIXED codebook — the append-batch core (the ivfAssign
    * analog; double evaluation of the score arrays is fine at batch
    * size). */
  private[operators] def pqAssign(base: DataFrame,
                                  cbs: Seq[Seq[Seq[Double]]]): DataFrame =
    codesFromScores(base.select(
      col("vec_id") +: (0 until NumSub).map(m =>
        scoreArray(col("v"), cbs(m), m).as(s"s$m")): _*))

  /** Materialized code table (vec_id, codes[M]) — the maintained
    * artifact ADC scoring reads instead of the raw vectors. Staged
    * behind a short-lived checkpoint so argmax's two references read
    * bound attributes (the ivfCells discipline). */
  private[graft] def pqCodes(spark: SparkSession, dir: String): DataFrame =
    Dedup.memo(spark, s"pqCodes|$dir") {
      val cbs = fitCodebooks(spark, dir)
      val (staged, stagedIds) = Dedup.trackedCheckpoint(
        Similarity.embBase(spark, dir).select(
          col("vec_id") +: (0 until NumSub).map(m =>
            scoreArray(col("v"), cbs(m), m).as(s"s$m")): _*))
      val out = codesFromScores(staged).transform(Dedup.checkpointSer)
      Dedup.unpersistIds(spark, stagedIds)
      out
    }

  /** The fitted codebooks as a persistable (m, code, codeword) table —
    * M·K rows; the train-once model artifact writeIndexes ships with
    * the code table (ivfCentroidsFit posture). Codes are 1-based,
    * matching array_position in the encode scan. */
  private[operators] def codebookTable(spark: SparkSession, dir: String): DataFrame =
    Dedup.memo(spark, s"pqCodebooksFit|$dir") {
      val cbs = fitCodebooks(spark, dir)
      spark.createDataFrame(
          for { (cb, m) <- cbs.zipWithIndex; (c, i) <- cb.zipWithIndex }
            yield (m, i + 1, c))
        .toDF("m", "code", "codeword")
    }

  /** Read the persisted codebook artifact (appendIndexes: a batch is
    * encoded under the SHIPPED model, never a refit). */
  private[operators] def readCodebookArtifact(spark: SparkSession,
                                              indexDir: String): Option[Seq[Seq[Seq[Double]]]] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/pqCodebooksFit.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val rows = spark.read.parquet(p.toString).orderBy("m", "code").collect()
      if (rows.isEmpty) None
      else Some(rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map(_._2
        .sortBy(_.getInt(1))
        .map(r => r.getSeq[Double](r.fieldIndex("codeword")).toSeq).toSeq))
    }
  }

  /** Per-query M×K ADC lookup table (each entry a 9-dp-rounded
    * DECIMAL) as a nested array on a query-count-row frame — always
    * broadcast by the consumers. */
  private def queryLut(spark: SparkSession, dir: String,
                       cbs: Seq[Seq[Seq[Double]]], nQueries: Int): DataFrame =
    queryLutWhere(spark, dir, cbs, col("vec_id") < nQueries)

  private def queryLutWhere(spark: SparkSession, dir: String,
                            cbs: Seq[Seq[Seq[Double]]], qpred: Column): DataFrame =
    queryLutOf(Similarity.embBase(spark, dir).filter(qpred), cbs)

  /** The LUT over an ARBITRARY embBase-shaped query batch — the
    * online-serving head ([[Similarity.annServeBatchIvfPq]]) computes
    * lookup tables for vectors the corpus never saw; the corpus-query
    * paths above are the special case of a corpus-prefix batch. */
  private[operators] def queryLutOf(qb: DataFrame,
                                    cbs: Seq[Seq[Seq[Double]]]): DataFrame =
    qb.select(col("vec_id").as("query_id"),
      array((0 until NumSub).map(m =>
        array(cbs(m).map(c =>
          round(dot(subCol(col("v"), m), typedLit(c)), 9)
            .cast("decimal(29,9)")): _*)): _*).as("lut"))

  /** The ADC sum: M lookups into the bound `lut` by the bound `codes`,
    * added exactly (DECIMAL chain — order-free). */
  private def adcExpr: Column =
    (0 until NumSub).map(m =>
      element_at(element_at(col("lut"), m + 1),
        element_at(col("codes"), m + 1))).reduce(_ + _)

  /** ADC scores of every (query, candidate) pair — the exhaustive
    * compressed-domain scan. */
  private def adcScores(spark: SparkSession, dir: String,
                        cbs: Seq[Seq[Seq[Double]]], nQueries: Int): DataFrame =
    pqCodes(spark, dir).crossJoin(broadcast(queryLut(spark, dir, cbs, nQueries)))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adcExpr.as("adc"))

  /** ADC scores over a pre-pruned (query_id, neighbor_id) candidate
    * table — the IVF+PQ serving core: only survivors' codes are
    * scored. */
  private def adcScoreOf(spark: SparkSession, dir: String,
                         cbs: Seq[Seq[Seq[Double]]], pairs: DataFrame,
                         nQueries: Int): DataFrame =
    adcScoreWithLut(spark, dir, pairs, queryLut(spark, dir, cbs, nQueries))

  /** ADC scores of a candidate table under an EXPLICIT per-query LUT
    * frame — shared by the corpus-query path above and the
    * online-serving head (whose LUTs come from a query batch, not the
    * corpus). */
  private[operators] def adcScoreWithLut(spark: SparkSession, dir: String,
                                         pairs: DataFrame,
                                         lut: DataFrame): DataFrame =
    pairs
      .join(pqCodes(spark, dir).select(col("vec_id").as("neighbor_id"),
        col("codes")), Seq("neighbor_id"))
      .join(broadcast(lut), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), adcExpr.as("adc"))

  /** PQ-ADC top-k: approximate inner-product ranking straight off the
    * code table. */
  def knnPq(spark: SparkSession, dir: String,
            nQueries: Int = NumQueriesDefault, k: Int = TopKDefault): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    adcScores(spark, dir, fitCodebooks(spark, dir), nQueries)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc").cast("double"), 6).as("adc_score"), col("rn"))
      .orderBy("query_id", "rn")
  }

  /** PQ-ADC shortlist + exact-cosine rerank — the production serving
    * shape (compressed-domain scan selects RerankCands, full-precision
    * vectors re-score only the shortlist). */
  def knnPqRerank(spark: SparkSession, dir: String,
                  nQueries: Int = NumQueriesDefault, k: Int = TopKDefault,
                  nCands: Int = RerankCands): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    val cands = adcScores(spark, dir, fitCodebooks(spark, dir), nQueries)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nCands)
      .select("query_id", "neighbor_id")
    Similarity.rerankTopK(Similarity.embBase(spark, dir), cands, nQueries, k)
  }

  /** [[knnPqRerank]] under the recall-TUNED shortlist size — the
    * serving configuration the 9-leg recall report asked for after it
    * measured pq_rerank at 0.56 natural recall under the fixed
    * 32-candidate default. Same plan shape; only the shortlist bound
    * (a literal) changes. */
  def knnPqRerankTuned(spark: SparkSession, dir: String,
                       nQueries: Int = NumQueriesDefault,
                       k: Int = TopKDefault): DataFrame =
    knnPqRerank(spark, dir, nQueries, k, tunedRerankCands(spark, dir, k))

  /** Shortlist-size ladder for the rerank tuner: starts at the fixed
    * default, caps at 256 — past that the rerank approaches an exact
    * scan and the honest answer is "re-shape the quantizer (more
    * codes/subspaces)", not "rerank everything". */
  private[operators] val RerankLadder = Seq(32, 64, 128, 256)

  private val rerankTuneCache =
    graft.sources.SessionSweep.scoped(new java.util.concurrent.ConcurrentHashMap[String, Integer]())

  /** Mean recall@k of the exact-reranked size-`cands` ADC shortlist
    * over held-out queries [loQ, hiQ) against the exact top-k. */
  private def rerankRecallAt(spark: SparkSession, dir: String,
      cbs: Seq[Seq[Seq[Double]]], cands: Int, loQ: Long, hiQ: Long,
      k: Int, exact: DataFrame): Double = {
    val qpred = col("vec_id") >= loQ && col("vec_id") < hiQ
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    val shortlist = pqCodes(spark, dir)
      .crossJoin(broadcast(queryLutWhere(spark, dir, cbs, qpred)))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adcExpr.as("adc"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= cands)
      .select("query_id", "neighbor_id")
    val base = Similarity.embBase(spark, dir)
    val qv = base.filter(qpred).select(col("vec_id").as("query_id"),
      col("v").as("v_q"), col("nrm").as("nrm_q"))
    val cv = base.select(col("vec_id").as("neighbor_id"),
      col("v").as("v_c"), col("nrm").as("nrm_c"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val approx = shortlist.join(cv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("v_q"), col("v_c")) / (col("nrm_q") * col("nrm_c"))).as("cos"))
      .withColumn("rn", row_number().over(wr)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id")
    val stats = exact.join(approx.withColumn("hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n"), count(col("hit")).as("hits"))
      .collect()(0)
    if (stats.getLong(0) == 0) 0.0
    else stats.getLong(1).toDouble / stats.getLong(0)
  }

  /** Recall-targeted ADC shortlist size: the smallest [[RerankLadder]]
    * rung whose exact-reranked recall@k on the held-out natural-query
    * sample reaches [[SimilarityIvf.RecallTarget]] — the third
    * instance of the tuned-budget pattern (ivfProbeTuned /
    * lshProbeTuned), persisted as the `pqRerankTuned` artifact so a
    * primed session never re-runs the held-out exact-kNN walk. An
    * empty sample serves the disclosed ladder ceiling. */
  private[operators] def tunedRerankCands(spark: SparkSession, dir: String,
      k: Int = TopKDefault): Int = {
    val key = s"${Dedup.sessionKey(spark)}|$dir|$k"
    val hit = rerankTuneCache.get(key)
    if (hit != null) return hit.intValue()
    Dedup.memoGet(spark, s"pqRerankTuned|$dir").foreach { tbl =>
      val row = tbl.filter(col("k") === k).select("cands").collect()
      if (row.nonEmpty) {
        val r = row(0).getInt(0)
        rerankTuneCache.put(key, r)
        return r
      }
    }
    computeTunedRerank(spark, dir, k, key)
  }

  private def computeTunedRerank(spark: SparkSession, dir: String,
      k: Int, key: String): Int = {
    val cbs = fitCodebooks(spark, dir)
    val lo = NumQueriesDefault.toLong
    val hi = lo + SimilarityIvf.TuneHeldOut
    val truth = SimilarityIvf.sharedTuneTruth(spark, dir, lo, hi, k)
    val chosen =
      if (truth.isEmpty) {
        System.err.println(
          s"[tunedRerankCands] empty held-out sample for $dir ids [$lo,$hi) — " +
            s"serving the ladder ceiling (${RerankLadder.last})")
        RerankLadder.last
      } else RerankLadder.find(c =>
        rerankRecallAt(spark, dir, cbs, c, lo, hi, k, truth) >=
          SimilarityIvf.RecallTarget)
        .getOrElse(RerankLadder.last)
    rerankTuneCache.put(key, chosen)
    chosen
  }

  /** The pqRerankTuned index artifact — (k, cands). */
  private[operators] def rerankTunedTable(spark: SparkSession, dir: String): DataFrame = {
    val k = TopKDefault
    val c = computeTunedRerank(spark, dir, k,
      s"${Dedup.sessionKey(spark)}|$dir|$k")
    val s2 = spark
    import s2.implicits._
    Seq((k, c)).toDF("k", "cands")
  }

  /** Artifact-wins invalidation for the tuned shortlist (on prime). */
  private[operators] def invalidateRerankTune(spark: SparkSession, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val prefix = s"${Dedup.sessionKey(spark)}|$dir|"
    rerankTuneCache.keySet.asScala.filter(_.startsWith(prefix))
      .foreach(rerankTuneCache.remove)
  }

  /** IVF + PQ — the FAISS IVFADC architecture: the fitted coarse
    * quantizer prunes candidates to the probed cells' populations and
    * ADC scores ONLY the survivors' codes. At 100 TB this is the
    * serving shape that makes billion-vector search tractable: the
    * probe touches nprobe/k of the corpus and each touched vector
    * costs M byte-lookups, so the scan reads neither the raw floats
    * nor the full code table. */
  def knnIvfPq(spark: SparkSession, dir: String,
               nQueries: Int = NumQueriesDefault, k: Int = TopKDefault): DataFrame = {
    val cbs = fitCodebooks(spark, dir)
    val cents = SimilarityIvf.fitCentroids(spark, dir)
    val nprobe = SimilarityIvf.probeFor(cents.length)
    val cands = broadcast(
        SimilarityIvf.queryProbes(spark, dir, cents, nprobe, nQueries))
      .join(SimilarityIvf.ivfCellsFit(spark, dir)
        .select(col("vec_id").as("neighbor_id"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    adcScoreOf(spark, dir, cbs, cands, nQueries)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc").cast("double"), 6).as("adc_score"), col("rn"))
      .orderBy("query_id", "rn")
  }

  /** IVF + PQ + refine — the FAISS `IndexIVFPQ` wrapped in an
    * `IndexRefineFlat`, with BOTH serving knobs drawn from their
    * persisted tuned-budget artifacts: the probe budget from
    * ivfProbeTuned ([[SimilarityIvf.tunedProbe]]) and the rerank
    * shortlist from pqRerankTuned ([[tunedRerankCands]]). The 10-leg
    * recall report measured raw [[knnIvfPq]] at 0.12 natural recall —
    * under-probing (k/8 heuristic) compounded by serving raw ADC
    * ranks from a 4-bit quantizer; this is the closure: probe wider,
    * ADC-rank ONLY the probed cells' codes, then re-score the tuned
    * shortlist against full-precision vectors.
    *
    * Scale shape: the probe touches nprobe/kCells of the corpus, the
    * ADC scan reads only the survivors' M-byte codes, and the
    * full-precision fetch is shortlist-sized (queries × cands rows) —
    * the raw float column is never scanned corpus-wide. That is the
    * billion-vector serving architecture: compressed-domain recall,
    * full-precision precision, both budgets measured not guessed. */
  def knnIvfPqRefined(spark: SparkSession, dir: String,
                      nQueries: Int = NumQueriesDefault,
                      k: Int = TopKDefault): DataFrame = {
    val cbs = fitCodebooks(spark, dir)
    val cents = SimilarityIvf.fitCentroids(spark, dir)
    val nprobe = SimilarityIvf.tunedProbe(spark, dir, k)
    val nCands = tunedRerankCands(spark, dir, k)
    val cands = broadcast(
        SimilarityIvf.queryProbes(spark, dir, cents, nprobe, nQueries))
      .join(SimilarityIvf.ivfCellsFit(spark, dir)
        .select(col("vec_id").as("neighbor_id"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    val shortlist = adcScoreOf(spark, dir, cbs, cands, nQueries)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nCands)
      .select("query_id", "neighbor_id")
    Similarity.rerankTopK(Similarity.embBase(spark, dir), shortlist, nQueries, k)
  }

  /** Code-usage histogram per subspace — the index-health audit
    * (a subspace whose vectors collapse into few codes has lost
    * resolution and its codebook should be refit; the ivfStats
    * analog). */
  def pqStats(spark: SparkSession, dir: String): DataFrame =
    pqCodes(spark, dir)
      .select(posexplode(col("codes")).as(Seq("m", "code")))
      .groupBy("m", "code").agg(count(lit(1)).as("n_vecs"))
      .orderBy("m", "code")
}

/** Driver-contract registration: all three PQ oracles are dynamic —
  * the fitted codebooks are inlined as literals at Verify dump time
  * (the q_knn_ivf_fit discipline), so encoding, LUT construction, and
  * ADC ranking all hash-check against DuckDB. */
object PqModule extends QueryModule {
  import SimilarityPq._

  def queries = Map(
    "q_knn_pq" -> ((s: SparkSession, d: String) => knnPq(s, d)),
    "q_knn_pq_rerank" -> ((s: SparkSession, d: String) => knnPqRerank(s, d)),
    "q_knn_pq_rerank_tuned" -> ((s: SparkSession, d: String) => SimilarityPq.knnPqRerankTuned(s, d)),
    "q_knn_ivfpq" -> ((s: SparkSession, d: String) => knnIvfPq(s, d)),
    "q_knn_ivfpq_refined" -> ((s: SparkSession, d: String) => knnIvfPqRefined(s, d)),
    "q_ann_serve_ivfpq" -> ((s: SparkSession, d: String) => Similarity.annServeFixedPq(s, d)),
    "q_pq_stats" -> ((s: SparkSession, d: String) => pqStats(s, d)))

  def oracles = Map.empty[String, String]

  private def listLit(xs: Seq[Double]): String = xs.mkString("[", ", ", "]")

  /** Codebook VALUES + the encode argmax — the SQL twin of pqCodes. */
  private def cbCtes(cbs: Seq[Seq[Seq[Double]]]): String = {
    val rows = (for { (cb, m) <- cbs.zipWithIndex; (c, i) <- cb.zipWithIndex }
      yield s"($m, ${i + 1}, ${listLit(c)}::DOUBLE[], ${halfNorm(c)})")
      .mkString(",\n    ")
    s"""cb(m, code, cv, hn) AS (VALUES
       |    $rows),
       |sub AS (SELECT vec_id, m, code,
       |        list_dot_product(list_slice(v, m * 8 + 1, m * 8 + 8), cv) - hn AS dt
       |        FROM e CROSS JOIN cb),
       |codes AS (SELECT vec_id, m, code FROM (
       |    SELECT vec_id, m, code,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dt DESC, code ASC) AS rn
       |    FROM sub) WHERE rn = 1)""".stripMargin
  }

  /** Per-query LUT — the SQL twin of queryLut. */
  private val lutCte: String =
    """lut AS (SELECT vec_id AS query_id, m, code,
      |        round(list_dot_product(list_slice(v, m * 8 + 1, m * 8 + 8), cv), 9) AS w
      |        FROM e CROSS JOIN cb WHERE vec_id < 10)""".stripMargin

  /** LUT + exhaustive exact-DECIMAL ADC sum — the SQL twin of
    * adcScores. */
  private def adcCtes(cbs: Seq[Seq[Seq[Double]]]): String =
    s"""${cbCtes(cbs)},
       |$lutCte,
       |sc AS (SELECT query_id, c.vec_id AS neighbor_id,
       |         SUM(CAST(w AS DECIMAL(29,9))) AS adc
       |       FROM codes c JOIN lut ON lut.m = c.m AND lut.code = c.code
       |       WHERE c.vec_id <> lut.query_id GROUP BY 1, 2)""".stripMargin

  /** Fitted-IVF cell assignment + query probes + candidate join — the
    * SQL twin of the ivfCellsFit / queryProbes composition (same
    * literal-centroid discipline and tie-breaks as q_knn_ivf_fit's
    * oracle). */
  private[operators] def ivfCtes(cents: Seq[Seq[Double]], nprobe: Int,
                                 candName: String = "cand"): String = {
    val rows = cents.zipWithIndex
      .map { case (c, i) => s"(${i + 1}, ${listLit(c)}::DOUBLE[])" }
      .mkString(",\n    ")
    s"""cents(cell, cv) AS (VALUES
       |    $rows),
       |d AS (SELECT vec_id, cell, list_dot_product(v, cv) AS dt FROM e CROSS JOIN cents),
       |assign AS (SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dt DESC, cell ASC) AS rn
       |    FROM d) WHERE rn = 1),
       |qcells AS (SELECT vec_id AS query_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dt DESC, cell DESC) AS rn
       |    FROM d WHERE vec_id < 10) WHERE rn <= $nprobe),
       |$candName AS (SELECT DISTINCT query_id, a.vec_id AS neighbor_id
       |         FROM qcells JOIN assign a USING (cell)
       |         WHERE a.vec_id <> qcells.query_id)""".stripMargin
  }

  private[operators] def pqIvfOracleSql(cbs: Seq[Seq[Seq[Double]]],
                             cents: Seq[Seq[Double]], nprobe: Int): String =
    s"""WITH ${SimilarityModule.eCte},
       |${ivfCtes(cents, nprobe)},
       |${cbCtes(cbs)},
       |$lutCte,
       |sc AS (SELECT cand.query_id, cand.neighbor_id,
       |         SUM(CAST(w AS DECIMAL(29,9))) AS adc
       |       FROM cand
       |       JOIN codes cd ON cd.vec_id = cand.neighbor_id
       |       JOIN lut ON lut.query_id = cand.query_id
       |              AND lut.m = cd.m AND lut.code = cd.code
       |       GROUP BY 1, 2)
       |SELECT query_id, neighbor_id, round(CAST(adc AS DOUBLE), 6) AS adc_score, rn
       |FROM (SELECT query_id, neighbor_id, adc,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |                           ORDER BY adc DESC, neighbor_id ASC) AS rn
       |      FROM sc)
       |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin

  /** IVF probe → ADC shortlist of `cands` → exact-cosine rerank — the
    * SQL twin of knnIvfPqRefined. The IVF candidate CTE is renamed so
    * rerankTail's `cand` can be the ADC shortlist. */
  private[operators] def pqIvfRefinedOracleSql(cbs: Seq[Seq[Seq[Double]]],
      cents: Seq[Seq[Double]], nprobe: Int, cands: Int): String =
    s"""WITH ${SimilarityModule.eCte},
       |${ivfCtes(cents, nprobe, "ivfc")},
       |${cbCtes(cbs)},
       |$lutCte,
       |sc AS (SELECT ivfc.query_id, ivfc.neighbor_id,
       |         SUM(CAST(w AS DECIMAL(29,9))) AS adc
       |       FROM ivfc
       |       JOIN codes cd ON cd.vec_id = ivfc.neighbor_id
       |       JOIN lut ON lut.query_id = ivfc.query_id
       |              AND lut.m = cd.m AND lut.code = cd.code
       |       GROUP BY 1, 2),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
       |    FROM sc) WHERE rn <= $cands),
       |${SimilarityModule.rerankTail}""".stripMargin

  /** Serve-contract CTE variants: query slice vec_id ∈
    * [ServeLo, ServeHi) and NO self-exclusion (external traffic by
    * contract — the corpus replay finding itself at cos 1 is the
    * determinism anchor, exactly serveIvfOracleSql's discipline). */
  private def ivfServeCtes(cents: Seq[Seq[Double]], nprobe: Int): String = {
    val rows = cents.zipWithIndex
      .map { case (c, i) => s"(${i + 1}, ${listLit(c)}::DOUBLE[])" }
      .mkString(",\n    ")
    s"""cents(cell, cv) AS (VALUES
       |    $rows),
       |d AS (SELECT vec_id, cell, list_dot_product(v, cv) AS dt FROM e CROSS JOIN cents),
       |assign AS (SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dt DESC, cell ASC) AS rn
       |    FROM d) WHERE rn = 1),
       |qcells AS (SELECT vec_id AS query_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dt DESC, cell DESC) AS rn
       |    FROM d WHERE vec_id >= ${Similarity.ServeLo}
       |      AND vec_id < ${Similarity.ServeHi}) WHERE rn <= $nprobe),
       |ivfc AS (SELECT DISTINCT query_id, a.vec_id AS neighbor_id
       |         FROM qcells JOIN assign a USING (cell))""".stripMargin
  }

  private val lutServeCte: String =
    s"""lut AS (SELECT vec_id AS query_id, m, code,
       |        round(list_dot_product(list_slice(v, m * 8 + 1, m * 8 + 8), cv), 9) AS w
       |        FROM e CROSS JOIN cb
       |        WHERE vec_id >= ${Similarity.ServeLo}
       |          AND vec_id < ${Similarity.ServeHi})""".stripMargin

  /** SQL twin of [[Similarity.annServeFixedPq]]: fitted-IVF probe (no
    * self-exclusion) → per-query ADC shortlist at the tuned bound →
    * exact-cosine rerank with the serve presentation (cos rounded 6,
    * rn ≤ TopKDefault) — the pqIvfRefinedOracleSql chain under the
    * serve contract. */
  private def pqIvfServeOracleSql(cbs: Seq[Seq[Seq[Double]]],
      cents: Seq[Seq[Double]], nprobe: Int, cands: Int): String =
    s"""WITH ${SimilarityModule.eCte},
       |${ivfServeCtes(cents, nprobe)},
       |${cbCtes(cbs)},
       |$lutServeCte,
       |sc AS (SELECT ivfc.query_id, ivfc.neighbor_id,
       |         SUM(CAST(w AS DECIMAL(29,9))) AS adc
       |       FROM ivfc
       |       JOIN codes cd ON cd.vec_id = ivfc.neighbor_id
       |       JOIN lut ON lut.query_id = ivfc.query_id
       |              AND lut.m = cd.m AND lut.code = cd.code
       |       GROUP BY 1, 2),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
       |    FROM sc) WHERE rn <= $cands),
       |s AS (SELECT query_id, neighbor_id,
       |        list_dot_product(q.v, c.v) /
       |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
       |      FROM cand JOIN e q ON q.vec_id = cand.query_id
       |                JOIN e c ON c.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id, round(cos, 6) AS cos, rn FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
       |  FROM s)
       |WHERE rn <= ${Similarity.TopKDefault} ORDER BY query_id, rn""".stripMargin

  private[operators] def pqOracleSql(cbs: Seq[Seq[Seq[Double]]]): String =
    s"""WITH ${SimilarityModule.eCte},
       |${adcCtes(cbs)}
       |SELECT query_id, neighbor_id, round(CAST(adc AS DOUBLE), 6) AS adc_score, rn
       |FROM (SELECT query_id, neighbor_id, adc,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |                           ORDER BY adc DESC, neighbor_id ASC) AS rn
       |      FROM sc)
       |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin

  private[operators] def pqRerankOracleSql(cbs: Seq[Seq[Seq[Double]]],
      cands: Int = RerankCands): String =
    s"""WITH ${SimilarityModule.eCte},
       |${adcCtes(cbs)},
       |cand AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
       |    FROM sc) WHERE rn <= $cands),
       |${SimilarityModule.rerankTail}""".stripMargin

  private def pqStatsOracleSql(cbs: Seq[Seq[Seq[Double]]]): String =
    s"""WITH ${SimilarityModule.eCte},
       |${cbCtes(cbs)}
       |SELECT m, code, COUNT(*) AS n_vecs FROM codes
       |GROUP BY 1, 2 ORDER BY m, code""".stripMargin

  override def dynamicOracles(spark: SparkSession, dir: String): Map[String, String] = {
    val cbs = fitCodebooks(spark, dir)
    val cents = SimilarityIvf.fitCentroids(spark, dir)
    Map(
      "q_knn_pq" -> pqOracleSql(cbs),
      "q_knn_pq_rerank" -> pqRerankOracleSql(cbs),
      // the tuned shortlist bound resolves at dump time like the tuned
      // nprobe/radius — the same rerank SQL replays at that bound
      "q_knn_pq_rerank_tuned" -> pqRerankOracleSql(cbs,
        SimilarityPq.tunedRerankCands(spark, dir)),
      "q_knn_ivfpq" -> pqIvfOracleSql(cbs, cents, SimilarityIvf.probeFor(cents.length)),
      // both tuned budgets resolve at dump time from their artifacts
      // (or the same-session ladder walks), so the literals match the
      // serving plan bit-for-bit
      "q_knn_ivfpq_refined" -> pqIvfRefinedOracleSql(cbs, cents,
        SimilarityIvf.tunedProbe(spark, dir),
        SimilarityPq.tunedRerankCands(spark, dir)),
      "q_ann_serve_ivfpq" -> pqIvfServeOracleSql(cbs, cents,
        SimilarityIvf.tunedProbe(spark, dir),
        SimilarityPq.tunedRerankCands(spark, dir)),
      "q_pq_stats" -> pqStatsOracleSql(cbs))
  }
}
