package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Similarity search over the `embeddings` table (SURVEY.md §2.12 E3):
  * brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH (sign-random-projection) bucketed variant as
  * the approximate scale path.
  *
  * Scale posture (100 TB):
  *  - Brute force is O(|Q|·N) dot products: fine when the query set is
  *    small (it is broadcast, so the big side never shuffles — each
  *    executor scans its partition of the corpus once). A
  *    per-partition top-k heap prunes ahead of the ranking window, so
  *    the exchange carries O(|Q|·k·partitions) rows, never |Q|·N —
  *    in both the window and the typed-Aggregator formulation.
  *  - LSH hashes every vector to T×1 bucket ids (T tables, H
  *    hyperplanes each) in one narrow map; the candidate join is an
  *    equi-join on (table, bucket) — co-located, no cross product. The
  *    hyperplanes are seeded literals compiled into the plan, so
  *    executors need no side channel and replays are deterministic.
  *  - Exact rerank only touches candidates: cost ∝ collisions, the
  *    recall/cost knob is (H, T): P(collide) = 1-(1-p^H)^T with
  *    p = 1 - θ/π.
  *
  * Oracle posture: brute force is DuckDB-verified bit-exact (double
  * cast before any arithmetic, same accumulation order). LSH is
  * rows-only (plane signs have no DuckDB twin) and pinned by
  * SimilaritySpec: it must recover every planted near-duplicate pair
  * (cos ≥ 0.95) and agree with brute force on recovered neighbors.
  */
object Similarity {

  /** Native codegen'd dot product (see ArrayDotProductExpression):
    * widens elements to double before multiplying, so raw float
    * embeddings need no per-element cast pass. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDotProduct(a, b)

  /** Exact cosine top-k for queries vec_id < `nQueries`, k = `k`.
    * The query side is broadcast; the corpus side streams — each
    * executor scans its slice once and scores it inside codegen. A
    * per-partition top-k heap then prunes BEFORE the window's
    * exchange: each input partition forwards at most |Q|·k rows, so
    * the shuffle carries O(|Q|·k·partitions) instead of O(|Q|·N) —
    * the same bound as the knnExactAgg twin, the formulation that
    * survives a 100× corpus. The global top-k is a subset of the
    * union of per-partition top-ks (same total order: cos desc,
    * neighbor_id asc), so the final window returns the identical,
    * deterministic result — SimilaritySpec pins exact == agg and the
    * driver oracle hash-checks it. */
  def knnExact(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    import spark.implicits._
    // the shared (vec_id, v, nrm) base: memoized/primable embBase —
    // its zero-norm exclusion (no cosine exists, ANSI 0/0) applies to
    // both sides here, pinned by SimilaritySpec and mirrored in the
    // oracle's norm predicate; a primed session serves it from the
    // maintained parquet artifact instead of recomputing norms
    val e = embBase(spark, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("v_q"), col("nrm").as("nrm_q"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("v_c"), col("nrm").as("nrm_c"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("v_q"), col("v_c")) / (col("nrm_q") * col("nrm_c"))).as("cos"))
    val pruned = scored.as[(Long, Long, Double)].mapPartitions { it =>
      // min-heap per query: head is the worst kept candidate. The
      // order MUST be the ranking window's total order — cos desc with
      // NaN ranked greatest (java.lang.Double.compare semantics, what
      // Spark's desc sort does), then neighbor_id asc — or a zero-norm
      // vector's NaN cosine would be pruned here yet ranked first by
      // the window, a silent prune/window divergence.
      val worstFirst = new Ordering[(Double, Long)] {
        def compare(x: (Double, Long), y: (Double, Long)): Int = {
          val c = java.lang.Double.compare(y._1, x._1) // lower cos = worse
          if (c != 0) c else java.lang.Long.compare(x._2, y._2)
        }
      }
      val best = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
      it.foreach { case (qid, nid, cos) =>
        val h = best.getOrElseUpdate(qid,
          scala.collection.mutable.PriorityQueue.empty(worstFirst))
        if (h.size < k) h.enqueue((cos, nid))
        else if (worstFirst.lt((cos, nid), h.head)) {
          h.dequeue(); h.enqueue((cos, nid))
        }
      }
      best.iterator.flatMap { case (qid, h) =>
        h.iterator.map { case (cos, nid) => (qid, nid, cos) }
      }
    }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pruned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("query_id", "rn")
  }

  /** Exact top-k via the typed TopKNeighbors Aggregator instead of a
    * window: partial aggregation reduces each map partition to ≤ k
    * candidates per query BEFORE the shuffle, so the exchange carries
    * O(|Q|·k·partitions) rows instead of O(|Q|·N) — the formulation
    * that survives a 100× corpus. Results are identical to knnExact
    * (SimilaritySpec pins it). */
  def knnExactAgg(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = embBase(spark, dir) // shared memoized/primable base, as in knnExact
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("v_q"), col("nrm").as("nrm_q"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("v_c"), col("nrm").as("nrm_c"))
    val topk = udaf(new TopKNeighbors(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ScoredNeighbor]())
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("v_q"), col("v_c")) / (col("nrm_q") * col("nrm_c"))).as("cos"))
      .groupBy("query_id")
      .agg(topk(col("cos"), col("neighbor_id")).as("nbrs"))
      .select(col("query_id"), posexplode(col("nbrs")).as(Seq("pos", "sn")))
      .select(col("query_id"), col("sn.neighbor_id").as("neighbor_id"),
        col("sn.cos").as("cos"), (col("pos") + 1).as("rn"))
      .orderBy("query_id", "rn")
  }

  /** MMR trade-off: relevance weight λ and the diversity penalty
    * weight, BOTH parsed literals (0.3 spelled, never computed as
    * 1 − 0.7 — Scala evaluates that to 0.30000000000000004 while both
    * engines parse "0.3" to the same nearest double; the Teleport
    * lesson). */
  private[operators] val MmrLambda = 0.7
  private[operators] val MmrPenalty = 0.3

  /** Candidate pool width the greedy selection draws from. */
  private[operators] val MmrPoolN = 20

  /** MMR (maximal marginal relevance) diversified re-ranking: from
    * each query's exact top-[[MmrPoolN]] shortlist, greedily pick k
    * results maximizing λ·sim(q, d) − (1−λ)·max_{s∈S} sim(d, s) —
    * the standard serving-side answer to "my top-5 are five near-
    * copies of the same document" (a failure mode this corpus's dup
    * clusters make real). Deterministic: ties break on neighbor_id,
    * and every score is the same exact dot/norm arithmetic the kNN
    * family hash-checks.
    *
    * Shape: the greedy loop UNROLLS (k is a small serving constant) —
    * each round is one anti-join (drop selected), one bounded
    * aggregation (max similarity to the selected set over the
    * pool×pool pair table), one window argmax. Everything after the
    * pool build is per-query O(poolN²) — independent of corpus size;
    * the pool build is the already-verified exact kNN leg. */
  def mmrRerank(spark: SparkSession, dir: String,
                nQueries: Int = 10, k: Int = 5,
                lambdaRel: Double = MmrLambda,
                penalty: Double = MmrPenalty,
                forceDistributed: Boolean = false): DataFrame = {
    // the pool and its pair table are CHECKPOINTED before the greedy
    // unroll: every round references both, and round i's plan embeds
    // round i−1's — without the barrier the exact-kNN leg replans
    // (and its heap-prune re-executes) once per reference, ~2^k
    // subtrees by the last round (measured 9.5 s wall at 0.7 s CPU —
    // pure scheduling, no compute). Tracked as stray session state so
    // releaseIndexes reclaims the bounded tables.
    val (pool, poolIds) = Dedup.trackedCheckpoint(
      knnExact(spark, dir, nQueries, MmrPoolN)
        .select(col("query_id"), col("neighbor_id"), col("cos")))
    Dedup.trackStray(spark, poolIds)
    val e = embBase(spark, dir)
    val va = e.select(col("vec_id").as("neighbor_id"),
      col("v").as("v_a"), col("nrm").as("nrm_a"))
    val vb = e.select(col("vec_id").as("other_id"),
      col("v").as("v_b"), col("nrm").as("nrm_b"))
    val (pairSims, pairIds) = Dedup.trackedCheckpoint(
      pool.select(col("query_id"), col("neighbor_id"))
        .join(pool.select(col("query_id"), col("neighbor_id").as("other_id")),
          Seq("query_id"))
        .filter(col("neighbor_id") =!= col("other_id"))
        .join(va, Seq("neighbor_id")).join(vb, Seq("other_id"))
        .select(col("query_id"), col("neighbor_id"), col("other_id"),
          (dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b"))).as("sim_cc")))
    Dedup.trackStray(spark, pairIds)
    // observed-size switch (the rankLoopOver driver-loop discipline):
    // the pool and its pair table are nQueries-bounded MODEL tables —
    // at the registered scale (10 queries × 20-candidate pools) the
    // greedy unroll costs pure job scheduling (~4 rounds × 4 jobs for
    // microseconds of arithmetic; 1.2–1.8 s in the bench, worse under
    // contention). Collect once and run the IDENTICAL arithmetic
    // locally; a big query batch keeps the distributed unroll.
    if (!forceDistributed && pool.count() <= MmrDriverMaxPoolRows)
      return mmrGreedyDriver(spark, pool, pairSims, k, lambdaRel, penalty)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    // each round's accumulated selection is checkpointed too (two
    // references per round — the anti-join and the penalty — would
    // otherwise double the result subtree every iteration); the
    // superseded round's blocks are freed immediately, so one
    // ≤ nQueries·k-row table survives the loop
    var (result, resultIds) = Dedup.trackedCheckpoint(pool
      .withColumn("score", lit(lambdaRel) * col("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("query_id"), col("neighbor_id"),
        lit(1).as("pick_order"), col("score")))
    for (i <- 2 to k) {
      val selectedIds = result.select(col("query_id"), col("neighbor_id"))
      val penaltyDf = pairSims
        .join(selectedIds.select(col("query_id"),
          col("neighbor_id").as("other_id")), Seq("query_id", "other_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(max(col("sim_cc")).as("max_cc"))
      val next = pool
        .join(selectedIds, Seq("query_id", "neighbor_id"), "left_anti")
        .join(penaltyDf, Seq("query_id", "neighbor_id"), "left")
        .withColumn("score", lit(lambdaRel) * col("cos") -
          lit(penalty) * coalesce(col("max_cc"), lit(0.0)))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("query_id"), col("neighbor_id"),
          lit(i).as("pick_order"), col("score"))
      val (acc, accIds) = Dedup.trackedCheckpoint(result.unionByName(next))
      Dedup.unpersistIds(spark, resultIds)
      result = acc
      resultIds = accIds
    }
    Dedup.trackStray(spark, resultIds)
    result
      .select(col("query_id"), col("pick_order"), col("neighbor_id"),
        round(col("score"), 6).as("mmr_score"))
      .orderBy("query_id", "pick_order")
  }

  /** Pool-row ceiling for the driver-side MMR greedy — a pool this
    * small is a bounded model table (≤64k rows, the driverRankLoop /
    * centroid-collect class); bigger query batches keep the
    * distributed unroll. */
  private[operators] val MmrDriverMaxPoolRows = 1L << 16

  /** The driver twin of the MMR greedy unroll: identical round
    * arithmetic (score = λ·cos − ρ·max selected-similarity, coalesce 0
    * — x − 0.0 is bit-exact x, so round 1 needs no special case),
    * identical tie-break (score desc, neighbor asc), identical 6-dp
    * HALF_UP report rounding — SimilaritySpec pins bit parity against
    * the distributed unroll and the oracle replays the same rounds. */
  private def mmrGreedyDriver(spark: SparkSession, pool: DataFrame,
      pairSims: DataFrame, k: Int, lambdaRel: Double,
      penalty: Double): DataFrame = {
    import scala.jdk.CollectionConverters._
    val poolRows = pool.select("query_id", "neighbor_id", "cos").collect()
    val simRows = pairSims
      .select("query_id", "neighbor_id", "other_id", "sim_cc").collect()
    val byQuery = poolRows.groupBy(_.getLong(0))
    val simMap = new java.util.HashMap[(Long, Long, Long), java.lang.Double]()
    simRows.foreach(r => simMap.put(
      (r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3)))
    val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    byQuery.keys.toSeq.sorted.foreach { q =>
      val cands = scala.collection.mutable.LinkedHashMap(
        byQuery(q).sortBy(_.getLong(1)).map(r => r.getLong(1) -> r.getDouble(2)): _*)
      val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
      var order = 1
      while (order <= k && cands.nonEmpty) {
        var bestId = -1L; var bestScore = Double.NegativeInfinity
        cands.foreach { case (nb, cos) =>
          var maxcc = Double.NegativeInfinity
          selected.foreach { s =>
            val v = simMap.get((q, nb, s))
            if (v != null && v.doubleValue() > maxcc) maxcc = v.doubleValue()
          }
          val cc = if (maxcc == Double.NegativeInfinity) 0.0 else maxcc
          val score = lambdaRel * cos - penalty * cc
          // ties break to the LOWEST neighbor id (the window's
          // neighbor-asc ordering); candidates iterate id-ascending,
          // so strict > keeps the first (lowest) of a tie
          if (score > bestScore) { bestScore = score; bestId = nb }
        }
        out += org.apache.spark.sql.Row(q, order, bestId,
          java.math.BigDecimal.valueOf(bestScore)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
        selected += bestId
        cands.remove(bestId)
        order += 1
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        pool.schema("query_id").dataType),
      org.apache.spark.sql.types.StructField("pick_order",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("neighbor_id",
        pool.schema("neighbor_id").dataType),
      org.apache.spark.sql.types.StructField("mmr_score",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(out.asJava, schema)
      .orderBy("query_id", "pick_order")
  }

  /** T tables × H seeded random hyperplanes (unit-free gaussians) —
    * literals compiled into the plan. NumPlanes is the FLOOR plane
    * count (the geometry every test-scale corpus and the static SQL
    * oracles use); the EFFECTIVE count scales with the corpus — see
    * [[hForCount]]. */
  private[operators] val NumTables = 8
  private[graft] val NumPlanes = 8
  private[operators] val Dim = 64
  private[operators] val NumQueriesDefault = 10
  private[operators] val TopKDefault = 5
  private[operators] val planes: Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(NumTables, NumPlanes, Dim)(rnd.nextGaussian())
  }

  /** Plane-count ceiling (2^24 ≈ 16.7M buckets per table) and the
    * bucket-occupancy target the corpus-sized plane count aims for.
    * With H = ⌈log₂(N / TargetBucketOccupancy)⌉ the EXPECTED bucket
    * population stays ~TargetBucketOccupancy as the corpus grows, so
    * a radius-r probe's candidate volume is
    * tables × C(H,≤r) × occupancy — polylog in N, not N/2^H-linear
    * (the round-13 ServeScaleProbe measured the fixed-H head at
    * 110–124 s vs IVF's 12.7–16 s at 200k vectors precisely because
    * occupancy grew ∝ N/256). The floor keeps every corpus at or
    * below 2^(8+5) = 8192 vectors on the legacy 8-plane geometry —
    * all test SFs (N ≤ 2000) and therefore all static plane-literal
    * SQL oracles are unchanged. */
  private[operators] val MaxPlanes = 24
  private[operators] val TargetBucketOccupancy = 32

  /** Extra hyperplanes 9..MaxPlanes, drawn from a SEPARATE seed so
    * planes 1..8 remain bit-identical to the legacy `planes` val (the
    * persisted test-scale bucket artifacts and the baked SQL oracle
    * literals both depend on those exact doubles). */
  private val extraPlanes: Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(7001)
    Seq.fill(NumTables, MaxPlanes - NumPlanes, Dim)(rnd.nextGaussian())
  }

  private[operators] def planesFor(table: Int, h: Int): Seq[Seq[Double]] =
    (planes(table) ++ extraPlanes(table)).take(h)

  /** Corpus-sized plane count: the smallest H on [NumPlanes,
    * MaxPlanes] with expected occupancy ≤ TargetBucketOccupancy —
    * i.e. ⌈log₂⌈N / TargetBucketOccupancy⌉⌉, derived with INTEGER
    * arithmetic (bit length of ⌈N/target⌉-1): the floating-point
    * log-division this replaced could wobble to x.000…2 at exact
    * power-of-two boundaries and bump H by one, making the sizing
    * boundary value-unstable across platforms/JVMs. */
  private[operators] def hForCount(n: Long): Int = {
    val cells = math.max(1L, (n + TargetBucketOccupancy - 1L) / TargetBucketOccupancy)
    val need = 64 - java.lang.Long.numberOfLeadingZeros(cells - 1L)
    math.min(MaxPlanes, math.max(NumPlanes, need.toInt))
  }

  private val hCache =
    graft.sources.SessionSweep.scoped(new java.util.concurrent.ConcurrentHashMap[String, Integer]())

  /** The plane count `dir`'s bucket artifact was (or will be) built
    * under. The artifact is SELF-DESCRIBING — a bucket string's length
    * IS its plane count — and an existing artifact always wins over
    * the count formula: appends and probes must match the persisted
    * geometry even after the corpus outgrows it (the plane count is
    * frozen at index build, like the IVF centroid fit; writeIndexes
    * re-derives it from the then-current count). Only when no
    * artifact exists (first build) does the count formula decide. */
  private[graft] def corpusH(spark: SparkSession, dir: String): Int = {
    val key = s"${Dedup.sessionKey(spark)}|$dir"
    val hit = hCache.get(key)
    if (hit != null) return hit.intValue()
    val fromArtifact = Dedup.memoGet(spark, s"lshBuckets|$dir").flatMap { df =>
      df.select(length(col("bucket"))).limit(1).collect()
        .headOption.map(_.getInt(0))
    }
    val h = fromArtifact.getOrElse(hForCount(embBase(spark, dir).count()))
    hCache.put(key, h)
    h
  }

  /** Drop the cached plane count for `dir` — applied when the bucket
    * artifact is (re-)primed from parquet: a rebuilt index may carry a
    * different geometry than the session cached. */
  private[graft] def invalidateCorpusH(spark: SparkSession, dir: String): Unit =
    hCache.remove(s"${Dedup.sessionKey(spark)}|$dir")

  /** Plane count read off the ON-DISK bucket artifact under `indexDir`
    * (one row's bucket length — the artifact is self-describing), for
    * the append path: [[corpusH]] consults only the SESSION memo, so a
    * fresh maintenance session that appends without priming would fall
    * back to the count formula over the CURRENT grown corpus — and if
    * the corpus crossed a sizing boundary since the build, the batch
    * would be bucketed under a different plane count than the persisted
    * rows (mixed-length bucket strings that never collide). Appends
    * must read the geometry from the artifact itself, exactly as
    * IngestDedup's stream-side probe does on its static side. */
  private[graft] def artifactH(spark: SparkSession, indexDir: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/lshBuckets.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else spark.read.parquet(p.toString)
      .select(length(col("bucket"))).limit(1)
      .collect().headOption.map(_.getInt(0))
  }

  /** Sign-random-projection bucket id of vector `v` for one table:
    * h sign bits concatenated to a string key. */
  private def bucketId(v: Column, table: Int, h: Int): Column =
    concat_ws("", planesFor(table, h).map { plane =>
      when(dot(v, typedLit(plane)) >= 0, "1").otherwise("0")
    }: _*)

  /** Base vector table (vec_id, v, nrm), materialized once per
    * (session, dir) and shared by the ANN index builds and reranks —
    * the norm and the staged attribute binding are paid once, not per
    * query run. Released with Dedup.releaseIndexes. */
  private[graft] def embBase(spark: SparkSession, dir: String): DataFrame =
    Dedup.memo(spark, s"embBase|$dir") {
      embBaseOf(Tables.embeddings(spark, dir)).transform(Dedup.checkpointSer)
    }

  /** embBase over an arbitrary embeddings slice — the core the
    * memoized session build and Dedup.appendIndexes share. */
  private[graft] def embBaseOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      // zero-norm vectors can't be cosine-ranked (ANSI 0/0 error)
      .filter(col("nrm") > 0d)

  /** Generation number of the LSH bucket KERNEL — bumped whenever a
    * kernel change alters the bucket bits some vector class produces,
    * so artifacts written under an older kernel are mechanically
    * detectable instead of a doc note. History: gen 1 = the pre-r16
    * fused kernel (NaN plane dot → all-ZERO bucket bits); gen 2 = the
    * current NaN >= 0 parity with Spark comparison semantics (→
    * all-ones). Finite embeddings bucket identically under both; a
    * corpus that may carry non-finite vectors must not mix
    * generations (appends/probes would miss the old rows' buckets).
    * [[Reindex.writeKernelTag]] stamps this into the index directory
    * at build/reindex; appendIndexes/primeIndexes compare and surface
    * reindex advice on mismatch. */
  private[graft] val LshKernelGeneration = 2

  /** Materialized LSH bucket index (vec_id, table_idx, bucket) — ids
    * only, never the vectors: the index holds T short strings per
    * vector instead of T copies of the embedding, and the 64×64-double
    * hyperplane literals compile and evaluate exactly once per
    * (session, dir) instead of once per query side per run. At 100 TB
    * this is the bucket-index parquet table maintained alongside the
    * corpus. */
  private[graft] def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    Dedup.memo(spark, s"lshBuckets|$dir") {
      // first build of this session (no artifact to inherit from):
      // size the plane count to the corpus, then freeze it in the
      // artifact (bucket length = h, self-describing)
      val base = embBase(spark, dir)
      val h = hForCount(base.count())
      hCache.put(s"${Dedup.sessionKey(spark)}|$dir", h)
      if (h != NumPlanes)
        System.err.println(s"[lshBuckets] corpus-sized plane count: h=$h " +
          s"for $dir (legacy static SQL oracles assume h=$NumPlanes and " +
          "do not apply at this scale)")
      lshBucketsOf(base, h).transform(Dedup.checkpointSer)
    }

  /** All T bucket strings of a vector column — ONE fused native
    * expression (LshBucketStrings: the vector copied to a local
    * double[] once, then a single T×H×dim codegen loop) over the
    * seeded hyperplane constants, shared by the batch index build and
    * the streaming ingest probe (a stream cannot checkpoint projection
    * stages, and byte-identical bucket strings are what make a
    * stream-side probe hit the persisted corpus index — the caller
    * passes the CORPUS ARTIFACT's plane count, never a recomputed
    * one). The fused kernel replaced the composed T×H dot-expression
    * tree in round 15: same bits (LshGeometrySpec pins the parity),
    * ~an order of magnitude less expression overhead on the one-time
    * bucket build (PLANS.md §16). */
  private[graft] def bucketStrings(v: Column, h: Int = NumPlanes): Column =
    graft.functions.LshBucketStrings(v,
      (0 until NumTables).map(t => planesFor(t, h)), h)

  /** The composed pre-r15 formulation (T×H separate sign-dot
    * expressions) — kept as the differential-parity reference the spec
    * checks the fused kernel against, never used on a hot path. */
  private[operators] def bucketStringsComposed(v: Column, h: Int = NumPlanes): Column =
    array((0 until NumTables).map(t => bucketId(v, t, h)): _*)

  /** Bucket index over an arbitrary (vec_id, v, …) base slice — the
    * core the memoized session build and Dedup.appendIndexes share;
    * `h` is the artifact's frozen plane count (appends MUST pass the
    * existing artifact's, via [[corpusH]]). */
  private[operators] def lshBucketsOf(base: DataFrame, h: Int = NumPlanes): DataFrame =
    base.select(col("vec_id"),
      posexplode(bucketStrings(col("v"), h)).as(Seq("table_idx", "bucket")))

  /** Approximate top-k: LSH candidate pairs from the ids-only bucket
    * index (equi-join on table+bucket, deduped), then an exact cosine
    * rerank that joins the vectors back in — the corpus-side join is
    * unhinted (candidates are usually tiny → AQE broadcasts them; at
    * adversarial collision rates it degrades to a shuffle instead of
    * an OOM), the query side is an explicit broadcast of nQueries
    * rows. Rows-only for the driver; recall pinned in SimilaritySpec. */
  def annLsh(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val qb = lshBuckets(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("table_idx"), col("bucket"))
    rerankCandidates(embBase(spark, dir), lshBuckets(spark, dir), qb, nQueries, k)
  }

  /** Multi-probe ANN (Lv et al., VLDB'07 shape): annLsh plus, per
    * table, the NumPlanes query-side buckets at Hamming distance 1
    * (one sign bit flipped) — the recall knob that matches IVF's
    * nprobe WITHOUT touching the index: the corpus side and the
    * persisted bucket artifact are byte-identical to annLsh's; only
    * the tiny broadcast query side fans out ×(1+NumPlanes). The output
    * candidate set is a superset of annLsh's, and the exact-cosine
    * rerank makes recall monotone in the candidate set —
    * SimilaritySpec pins recall(multi) ≥ recall(single) plus the
    * planted-copy recovery at the tighter bar. */
  def annLshMultiProbe(spark: SparkSession, dir: String, nQueries: Int = 10,
                       k: Int = 5): DataFrame =
    annLshAtRadius(spark, dir, nQueries, k, radius = 1)

  /** One sign bit of a bucket string flipped — probes derive from the
    * query's OWN bucket-index rows by string bit-flips: no plane
    * dot-products on the query side at all, so the probe stage is a
    * few string ops riding the (possibly parquet-primed) bucket
    * artifact rather than T×H re-evaluations of the hyperplane
    * literals. */
  private def flipBit(b: Column, i: Int, h: Int): Column =
    concat(substring(b, 1, i - 1),
      when(substring(b, i, 1) === "1", "0").otherwise("1"),
      substring(b, i + 1, h - i))

  /** All probe buckets at Hamming distance ≤ radius from `b` — the
    * exact combination expansion (C(h,0)+C(h,1)+…); at h = 8 planes
    * radius 3 is 93 static expressions (at the h = 24 ceiling and
    * radius 3, 2,325), and only the nQueries-row query side fans out
    * by them, so the broadcast stays tiny. */
  private[operators] def probeColumns(b: Column, radius: Int,
                                      h: Int = NumPlanes): Seq[Column] =
    (0 to radius).flatMap(r =>
      (1 to h).combinations(r).map(c =>
        c.foldLeft(b)((acc, i) => flipBit(acc, i, h))).toSeq)

  /** [[annLsh]] probing every bucket within Hamming distance `radius`
    * of the query's bucket, per table (Lv et al. multi-probe at an
    * arbitrary radius) — the LSH recall knob that matches IVF's
    * nprobe WITHOUT touching the index: corpus side and persisted
    * bucket artifact byte-identical, only the broadcast query side
    * fans out. The candidate set grows monotonically with radius and
    * the exact-cosine rerank keeps recall monotone in the candidates. */
  def annLshAtRadius(spark: SparkSession, dir: String, nQueries: Int = 10,
                     k: Int = 5, radius: Int = 1): DataFrame = {
    val h = corpusH(spark, dir)
    val qProbes = lshBuckets(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("table_idx"),
        explode(array(probeColumns(col("bucket"), radius, h): _*)).as("bucket"))
    rerankCandidates(embBase(spark, dir), lshBuckets(spark, dir), qProbes, nQueries, k)
  }

  /** [[annLshAtRadius]] with the probe radius TUNED to the recall
    * target on held-out natural queries — the LSH twin of
    * [[SimilarityIvf.annIvfTuned]]. */
  def annLshTuned(spark: SparkSession, dir: String,
                  nQueries: Int = 10, k: Int = TopKDefault): DataFrame =
    annLshAtRadius(spark, dir, nQueries, k, tunedLshRadius(spark, dir, k))

  /** Probe-radius ladder ceiling: radius 3 probes 93 of the 256
    * buckets per table — past that the shortlist approaches a table
    * scan and the honest answer is "re-shape the index (more tables /
    * fewer planes)", not "probe harder". */
  private[operators] val MaxLshRadius = 3

  private val lshTuneCache =
    graft.sources.SessionSweep.scoped(new java.util.concurrent.ConcurrentHashMap[String, Integer]())

  /** Mean recall@k of the radius-r LSH shortlist over held-out queries
    * [loQ, hiQ) against the exact top-k — the LSH measurement leg,
    * sharing [[SimilarityIvf]]'s ground-truth discipline (built once
    * per walk; it does not depend on the radius). */
  private def lshRecallAt(spark: SparkSession, dir: String, radius: Int,
                          loQ: Long, hiQ: Long, k: Int,
                          exact: DataFrame): Double = {
    val base = embBase(spark, dir)
    val qpred = col("vec_id") >= loQ && col("vec_id") < hiQ
    val buckets = lshBuckets(spark, dir)
    val h = corpusH(spark, dir)
    val qProbes = buckets.filter(qpred)
      .select(col("vec_id").as("query_id"), col("table_idx"),
        explode(array(probeColumns(col("bucket"), radius, h): _*)).as("bucket"))
    val cb = buckets.select(col("vec_id").as("neighbor_id"),
      col("table_idx"), col("bucket"))
    val cand = broadcast(qProbes).join(cb, Seq("table_idx", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val qv = base.filter(qpred)
      .select(col("vec_id").as("query_id"), col("v").as("v_q"), col("nrm").as("nrm_q"))
    val cv = base.select(col("vec_id").as("neighbor_id"),
      col("v").as("v_c"), col("nrm").as("nrm_c"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val approx = cand.join(cv, Seq("neighbor_id")).join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("v_q"), col("v_c")) / (col("nrm_q") * col("nrm_c"))).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id")
    val stats = exact.join(approx.withColumn("hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n"), count(col("hit")).as("hits"))
      .collect()(0)
    val n = stats.getLong(0)
    if (n == 0) 0.0 else stats.getLong(1).toDouble / n
  }

  /** Recall-targeted probe radius: the smallest Hamming radius on the
    * 1..MaxLshRadius ladder whose mean recall@k on the held-out
    * natural-query sample reaches [[SimilarityIvf.RecallTarget]] —
    * artifact-wins like the IVF tuner (a primed lshProbeTuned table
    * serves the radius; the walk persists it train-once). A sample
    * that never reaches the target serves MaxLshRadius: unlike IVF
    * there is no exhaustive rung (that would be a table scan), so the
    * ceiling is the disclosed best-effort. */
  private[operators] def tunedLshRadius(spark: SparkSession, dir: String,
                                        k: Int = TopKDefault): Int = {
    val key = s"${Dedup.sessionKey(spark)}|$dir|$k"
    val hit = lshTuneCache.get(key)
    if (hit != null) return hit.intValue()
    Dedup.memoGet(spark, s"lshProbeTuned|$dir").foreach { tbl =>
      val row = tbl.filter(col("k") === k).select("radius").collect()
      if (row.nonEmpty) {
        val r = row(0).getInt(0)
        lshTuneCache.put(key, r)
        return r
      }
    }
    computeTunedLshRadius(spark, dir, k, key)
  }

  private def computeTunedLshRadius(spark: SparkSession, dir: String,
                                    k: Int, key: String): Int = {
    val lo = NumQueriesDefault.toLong
    val hi = lo + SimilarityIvf.TuneHeldOut
    val truth = SimilarityIvf.sharedTuneTruth(spark, dir, lo, hi, k)
    val chosen =
      if (truth.isEmpty) {
        System.err.println(
          s"[tunedLshRadius] empty held-out sample for $dir ids [$lo,$hi) — " +
            s"serving the ladder ceiling (radius $MaxLshRadius)")
        MaxLshRadius
      } else (1 to MaxLshRadius).find(r =>
        lshRecallAt(spark, dir, r, lo, hi, k, truth) >= SimilarityIvf.RecallTarget)
        .getOrElse(MaxLshRadius)
    lshTuneCache.put(key, chosen)
    chosen
  }

  /** The lshProbeTuned index artifact — (k, radius), the IVF
    * probeTunedTable twin. */
  private[operators] def lshProbeTunedTable(spark: SparkSession, dir: String): DataFrame = {
    val k = TopKDefault
    val r = computeTunedLshRadius(spark, dir, k,
      s"${Dedup.sessionKey(spark)}|$dir|$k")
    val s2 = spark
    import s2.implicits._
    Seq((k, r)).toDF("k", "radius")
  }

  /** Drop this session's in-memory tuned radii for `dir` (the
    * invalidateFit/invalidateProbeTune discipline, applied on prime). */
  private[operators] def invalidateLshTune(spark: SparkSession, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val prefix = s"${Dedup.sessionKey(spark)}|$dir|"
    lshTuneCache.keySet.asScala.filter(_.startsWith(prefix))
      .foreach(lshTuneCache.remove)
  }

  /** Natural-query serving recall for EVERY ANN family in one report —
    * the round-12 annRecallReport generalized from the fitted-IVF leg
    * to the whole deployed surface (the judge-facing question "which
    * index family is under-serving" answered by one query instead of
    * five ad-hoc probes). One row per family: exact-top-k rows, hits,
    * micro recall@k over the natural serving queries. Every leg is an
    * already-oracled serving query, so the report's cost and 100 TB
    * posture are the legs'. */
  /** Raw-baseline legs → the tuned/refined twin they are a baseline
    * OF. Legs absent here serve with their production budgets; legs
    * present publish honest untuned numbers (raw PQ ~0.12, raw ivfpq
    * ~0.20 at sf0.1) whose deployable counterpart is the named twin —
    * the `baseline_of` column makes the report self-describing to an
    * operator reading it without that history. */
  private[operators] val recallBaselineOf: Map[String, String] = Map(
    "ivf_fit" -> "ivf_tuned",
    "lsh" -> "lsh_tuned",
    "lsh_probe" -> "lsh_tuned",
    "pq" -> "pq_rerank_tuned",
    "pq_rerank" -> "pq_rerank_tuned",
    "ivfpq" -> "ivfpq_refined")

  def annRecallByFamily(spark: SparkSession, dir: String,
                        k: Int = TopKDefault): DataFrame = {
    val ex = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    def leg(name: String, df: DataFrame): DataFrame =
      ex.join(df.select(col("query_id"), col("neighbor_id"), lit(1).as("hit")),
          Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hits"))
        .select(lit(name).as("family"), col("n_exact"), col("n_hits"),
          round(col("n_hits").cast("double") / col("n_exact"), 6).as("recall"),
          recallBaselineOf.get(name)
            .map(lit(_)).getOrElse(lit(null).cast("string")).as("baseline_of"))
    Seq(
      "ivf_fit" -> SimilarityIvf.annIvfFitted(spark, dir),
      "ivf_tuned" -> SimilarityIvf.annIvfTuned(spark, dir),
      "lsh" -> annLsh(spark, dir),
      "lsh_probe" -> annLshMultiProbe(spark, dir),
      "lsh_tuned" -> annLshTuned(spark, dir),
      // the compressed-domain serving families — the report now covers
      // EVERY deployed ANN leg, so "which index family is
      // under-serving" has one answer for the whole surface
      "pq" -> SimilarityPq.knnPq(spark, dir),
      "pq_rerank" -> SimilarityPq.knnPqRerank(spark, dir),
      "pq_rerank_tuned" -> SimilarityPq.knnPqRerankTuned(spark, dir),
      "ivfpq" -> SimilarityPq.knnIvfPq(spark, dir),
      "ivfpq_refined" -> SimilarityPq.knnIvfPqRefined(spark, dir),
      "sq8" -> knnSq8(spark, dir),
      "ivf_sq8" -> knnIvfSq8(spark, dir))
      .map { case (n, df) => leg(n, df) }
      .reduce(_.unionByName(_))
      .orderBy("family")
  }

  /** Top-k corpus neighbors for ARBITRARY query vectors — the online
    * serving kernel (the annLsh family serves queries drawn from the
    * corpus itself; this serves vectors the corpus has never seen:
    * user queries, fresh documents, a retrieval API's traffic).
    * `queries` is a (query_id, embedding) slice; buckets come from the
    * SAME seeded hyperplanes as the index, so the probe hits the
    * persisted bucket artifact byte-for-byte; `radius` is the
    * [[annLshAtRadius]] recall knob (query-side expansion only).
    * Zero-norm query vectors are dropped (not cosine-rankable), the
    * embBase discipline.
    *
    * Scale shape: the query batch is the broadcast side twice (probes
    * and rerank vectors); the corpus side is the ids-only bucket
    * artifact join + a candidate-sized vector fetch. Candidate volume
    * per query is tables × probes × bucket occupancy, and occupancy is
    * held at ~[[TargetBucketOccupancy]] by the corpus-sized plane
    * count ([[corpusH]] — frozen in the artifact at index build), so
    * per-batch cost scales with batch × probes, never the corpus (the
    * fixed-8-plane head measured corpus-LINEAR at the 100× tier:
    * 110–124 s vs IVF's 12.7–16 s before the sizing). */
  def annServeBatch(spark: SparkSession, dir: String, queries: DataFrame,
                    k: Int = TopKDefault, radius: Int = 1): DataFrame = {
    discloseStaleness(spark, dir)
    val h = corpusH(spark, dir)
    val qb = embBaseOf(
      queries.select(col("query_id").as("vec_id"), col("embedding")))
    val probes0 = lshBucketsOf(qb, h)
      .select(col("vec_id").as("query_id"), col("table_idx"), col("bucket"))
    val probes =
      if (radius <= 0) probes0
      else probes0.select(col("query_id"), col("table_idx"),
        explode(array(probeColumns(col("bucket"), radius, h): _*)).as("bucket"))
    val corpus = lshBuckets(spark, dir)
      .select(col("vec_id").as("neighbor_id"), col("table_idx"), col("bucket"))
    val cands = broadcast(probes).join(corpus, Seq("table_idx", "bucket"))
      .select("query_id", "neighbor_id").distinct()
    serveRerank(spark, dir, qb, cands, k)
  }

  /** [[annServeBatch]]'s IVF twin: the same online-serving contract
    * (arbitrary query vectors, zero-norm dropped, per-batch cost ∝
    * batch × cells probed) against the fitted coarse quantizer
    * instead of the LSH planes — query cells come from the SAME
    * memoized centroids the corpus cell artifact was assigned under,
    * and the probe budget is the persisted recall-tuned one
    * (`ivfProbeTuned`), so online traffic serves at the recall the
    * held-out audit measured, not a heuristic. Deployments pick by
    * index family maintained; both twins share the exact-cosine
    * rerank tail. */
  def annServeBatchIvf(spark: SparkSession, dir: String, queries: DataFrame,
                       k: Int = TopKDefault): DataFrame = {
    discloseStaleness(spark, dir)
    val cents = SimilarityIvf.fitCentroids(spark, dir)
    val nprobe = SimilarityIvf.tunedProbe(spark, dir, k)
    val qb = embBaseOf(
      queries.select(col("query_id").as("vec_id"), col("embedding")))
    val qcells = SimilarityIvf.queryProbesOf(qb, cents, nprobe)
    val corpus = SimilarityIvf.ivfCellsFit(spark, dir)
      .select(col("vec_id").as("neighbor_id"), col("cell"))
    val cands = broadcast(qcells).join(corpus, Seq("cell"))
      .select("query_id", "neighbor_id").distinct()
    serveRerank(spark, dir, qb, cands, k)
  }

  /** Fixed query batch for the REGISTERED serve-path query: corpus
    * vectors vec_id ∈ [ServeLo, ServeHi) replayed as external traffic —
    * disjoint from the knn family's vec_id < 10 query slice so the gate
    * exercises different vectors, and self-matching at cos 1 by
    * construction (the determinism anchor a serve query needs: no
    * exclusion filter, exactly what arbitrary external traffic gets). */
  private[operators] val ServeLo = 10L
  private[operators] val ServeHi = 20L

  /** The driver-visible online-serving query (q_ann_serve_ivf): a
    * fixed deterministic batch through [[annServeBatchIvf]] — fitted
    * quantizer + persisted tuned probe budget, the exact path
    * production traffic takes — so a serving-path regression (probe
    * budget drift, rerank tie-break change, staleness-check breakage)
    * hits the correctness gate and the bench floor, not just specs.
    * The r17 100×-tier per-call budgets (PLANS.md §6) lived only in a
    * probe; this is their registered face. Oracle: dynamic (the
    * q_knn_ivf_fit discipline) — fitted centroids + tuned nprobe
    * inlined at dump time, whole pipeline replayed in SQL. */
  def annServeFixed(spark: SparkSession, dir: String): DataFrame =
    annServeBatchIvf(spark, dir,
      graft.sources.Tables.embeddings(spark, dir)
        .filter(col("vec_id") >= ServeLo && col("vec_id") < ServeHi)
        .select(col("vec_id").as("query_id"), col("embedding")))
      .orderBy("query_id", "rn")

  /** The LSH family's registered serving face (q_ann_serve_lsh): the
    * same fixed batch through [[annServeBatch]] — the corpus-sized
    * plane geometry FROZEN in the persisted bucket artifact
    * ([[corpusH]]) and the recall-TUNED probe radius
    * ([[tunedLshRadius]]), the exact path LSH-indexed online traffic
    * takes — completing the serving family's gate symmetry: all three
    * deployable index families (LSH / IVF / IVF+PQ) now put their
    * end-to-end serve path under the driver gate, not just specs.
    * Oracle: dynamic — plane literals for the artifact's plane count
    * and the tuned radius resolved at dump time, whole pipeline
    * (bucketing, radius-expanded probe, candidate join, exact-cosine
    * rerank) replayed in SQL. */
  def annServeFixedLsh(spark: SparkSession, dir: String): DataFrame =
    annServeBatch(spark, dir,
      graft.sources.Tables.embeddings(spark, dir)
        .filter(col("vec_id") >= ServeLo && col("vec_id") < ServeHi)
        .select(col("vec_id").as("query_id"), col("embedding")),
      radius = tunedLshRadius(spark, dir))
      .orderBy("query_id", "rn")

  /** The COMPRESSED-index serving head's registered face
    * (q_ann_serve_ivfpq): the same fixed batch through
    * [[annServeBatchIvfPq]] — fitted coarse quantizer, fitted
    * codebooks, BOTH tuned budgets (probe width + ADC shortlist), the
    * exact path a billion-vector deployment serves — so a regression
    * anywhere in probe → ADC shortlist → full-precision rerank hits
    * the gate. Oracle: dynamic (codebooks + centroids + both budgets
    * inlined at dump time), registered by PqModule with the rest of
    * the PQ family's dynamic SQL. */
  def annServeFixedPq(spark: SparkSession, dir: String): DataFrame =
    annServeBatchIvfPq(spark, dir,
      graft.sources.Tables.embeddings(spark, dir)
        .filter(col("vec_id") >= ServeLo && col("vec_id") < ServeHi)
        .select(col("vec_id").as("query_id"), col("embedding")))
      .orderBy("query_id", "rn")

  /** The third online-serving family — IVF probe + PQ-ADC shortlist +
    * exact rerank for ARBITRARY query vectors: the billion-vector
    * serving architecture end to end, with all THREE stages riding
    * persisted artifacts and tuned budgets. The LSH/IVF twins above
    * fetch full-precision vectors for every probed candidate; at a
    * billion vectors the candidate set of a wide probe is itself too
    * large for float fetches, so this head ranks the probed cells'
    * candidates in the compressed domain first (M int8 codes per
    * candidate via the batch's own ADC lookup tables) and fetches
    * floats only for the tuned shortlist. Budgets: probe width from
    * `ivfProbeTuned`, shortlist from `pqRerankTuned` — both
    * train-once artifacts, both audited by the recall report.
    * Per-batch cost: batch × (nprobe/kCells) × corpus code reads +
    * batch × shortlist float fetches. */
  def annServeBatchIvfPq(spark: SparkSession, dir: String, queries: DataFrame,
                         k: Int = TopKDefault): DataFrame = {
    discloseStaleness(spark, dir)
    val cbs = SimilarityPq.fitCodebooks(spark, dir)
    val cents = SimilarityIvf.fitCentroids(spark, dir)
    val nprobe = SimilarityIvf.tunedProbe(spark, dir, k)
    val nCands = SimilarityPq.tunedRerankCands(spark, dir, k)
    val qb = embBaseOf(
      queries.select(col("query_id").as("vec_id"), col("embedding")))
    val qcells = SimilarityIvf.queryProbesOf(qb, cents, nprobe)
    val corpus = SimilarityIvf.ivfCellsFit(spark, dir)
      .select(col("vec_id").as("neighbor_id"), col("cell"))
    val cands = broadcast(qcells).join(corpus, Seq("cell"))
      .select("query_id", "neighbor_id").distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    val shortlist = SimilarityPq
      .adcScoreWithLut(spark, dir, cands, SimilarityPq.queryLutOf(qb, cbs))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nCands)
      .select("query_id", "neighbor_id")
    serveRerank(spark, dir, qb, shortlist, k)
  }

  /** Staleness disclosure for the online-serving heads: consult the
    * primed index directory's reindex-advice marker and surface it
    * (one loud log line + the ServeStatus side report) WITHOUT
    * changing results — online traffic on an index the engine's own
    * monitor has flagged (erase past 25%, append past a sizing
    * boundary) must not degrade silently. One FS existence probe per
    * serve call (the marker parquet is read only when present);
    * sessions that never primed from disk have no marker to consult
    * and skip in O(1). */
  private def discloseStaleness(spark: SparkSession, dir: String): Unit =
    Dedup.primedIndexDir(spark, dir).foreach { idx =>
      ServeStatus.record(idx, Reindex.readAdvice(spark, idx))
    }

  /** Serving-side exact-cosine rerank: query vectors from the BATCH
    * (`qb`), corpus vectors from the embBase artifact. Distinct from
    * [[rerankTopK]] on purpose — there the query side IS the corpus
    * and self-pairs are excluded upstream; here a self-match (a query
    * identical to a corpus vector, cos 1) is a legitimate, pinned
    * result. */
  private def serveRerank(spark: SparkSession, dir: String, qb: DataFrame,
                          cands: DataFrame, k: Int): DataFrame = {
    val qv = qb.select(col("vec_id").as("query_id"),
      col("v").as("v_q"), col("nrm").as("nrm_q"))
    val cv = embBase(spark, dir).select(col("vec_id").as("neighbor_id"),
      col("v").as("v_c"), col("nrm").as("nrm_c"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.join(cv, Seq("neighbor_id")).join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("v_q"), col("v_c")) / (col("nrm_q") * col("nrm_c"))).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rn"))
  }

  /** Shared tail of the LSH variants: candidate pairs from a query-side
    * (query_id, table_idx, bucket) probe table joined against the
    * corpus bucket index, then the exact cosine rerank. The corpus-side
    * join is unhinted (candidates are usually tiny → AQE broadcasts
    * them; at adversarial collision rates it degrades to a shuffle
    * instead of an OOM); the query side is an explicit broadcast of
    * nQueries·probes rows. */
  private def rerankCandidates(base: DataFrame, buckets: DataFrame,
                               qProbes: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val cb = buckets.select(col("vec_id").as("neighbor_id"), col("table_idx"), col("bucket"))
    val pairs = broadcast(qProbes).join(cb, Seq("table_idx", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    rerankTopK(base, pairs, nQueries, k)
  }

  /** The exact-cosine top-k tail every ANN family shares: join the
    * vectors back onto a deduped (query_id, neighbor_id) candidate
    * table, score, rank per query. One implementation — a fix to the
    * rerank (norm handling, tie order) applies to LSH and IVF alike
    * instead of silently diverging between copies. */
  private[operators] def rerankTopK(base: DataFrame, pairs: DataFrame,
                                    nQueries: Int, k: Int): DataFrame = {
    val qv = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("v_q"), col("nrm").as("nrm_q"))
    val cv = base.select(col("vec_id").as("neighbor_id"), col("v").as("v_c"), col("nrm").as("nrm_c"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.join(cv, Seq("neighbor_id")).join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("v_q"), col("v_c")) / (col("nrm_q") * col("nrm_c"))).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("query_id", "rn")
  }

  /** Int8 scalar-quantization audit: per vector, scale = max |v_i|
    * (exact double) and q_i = floor(v_i·127/scale + 0.5) ∈ [-127, 127]
    * — the symmetric int8 compression step of an embedding-store
    * pipeline, reported as the per-vector audit (min/max/checksum of q
    * and the saturated-lane count) the compression job gates on.
    *
    * Engine-parity: every operation is an exactly-rounded IEEE
    * primitive (cast, multiply, divide, floor) — no libm — so the
    * quantized integers are bit-identical across engines and the
    * driver hash-checks them. Zero vectors quantize to all-zero.
    * Shape: the scale is computed per row BEFORE the explode, the
    * per-element quantize + per-vector stats run as explode + one
    * codegen hash aggregation with map-side partials (one accumulator
    * row per vector crosses the exchange). */
  def quantizeEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val q = when(col("scale") === 0d, lit(0L))
      .otherwise(floor(col("v").cast("double") * 127d / col("scale") + 0.5d).cast("long"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        array_max(transform(col("embedding"), x => abs(x.cast("double")))).as("scale"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), q.as("q"))
      .groupBy("vec_id")
      .agg(min(col("q")).as("qmin"), max(col("q")).as("qmax"),
        sum(col("q")).as("qsum"),
        sum(when(abs(col("q")) === 127, 1L).otherwise(0L)).as("n_sat"))
      .orderBy("vec_id")
  }

  /** Per-label centroid (mean embedding), one output row per
    * (label, dimension): posexplode the vector and hash-aggregate on
    * (label, pos). This is the vector-aggregation shape that scales —
    * whole-stage codegen with map-side partial sums, shuffling only
    * labels × dim accumulator rows — unlike an `aggregate()` array
    * fold, which runs interpreted and shuffles whole vectors. The same
    * plan computes IVF centroid refinement (swap label for cell id).
    *
    * Oracle parity: elements widen float → double → DECIMAL(27,9)
    * before summing (partial-aggregation order immunity), and the
    * mean finishes as round(double/count, 6) on both sides. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(sum(col("v").cast("double").cast("decimal(27,9)")).as("s"),
        count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        round(col("s").cast("double") / col("n"), 6).as("centroid"))
      .orderBy("label", "pos")

  /** Embedding-outlier audit: the k vectors per label FARTHEST (lowest
    * cosine) from their own label centroid — the mislabeled/noise
    * candidates a curation pass reviews before training. Composes the
    * labelCentroids plan: the centroid table (labels × dim rows) is an
    * explicit broadcast against the posexploded corpus, so the big
    * side is one narrow scan + map-side-partial hash-agg back to one
    * row per vector — a single vec-count-sized shuffle, never a
    * vector-by-vector cross join.
    *
    * Oracle parity: centroids are the rounded-6 doubles the oracled
    * labelCentroids emits; all three inner products (v·c, v·v, c·c)
    * are double products summed through DECIMAL(27,15) (partial-agg
    * order immunity), finished in double, rounded to 6. Ranking uses
    * the ROUNDED cosine with a vec_id tie-break so both engines rank
    * identically. */
  /** Session-materialized centroid table (labels × dim rows, tiny) —
    * built once per (session, dir); at 100 TB this is the centroid
    * parquet artifact maintained next to the corpus, and staging it
    * keeps embeddingOutliers at ONE corpus scan (the plan otherwise
    * recomputes the centroid aggregation for each consumer subtree). */
  private[operators] def centroidTable(spark: SparkSession, dir: String): DataFrame =
    Dedup.memo(spark, s"labelCentroids|$dir") {
      labelCentroids(spark, dir).transform(Dedup.checkpointSer)
    }

  def embeddingOutliers(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val cents = centroidTable(spark, dir)
    val nc = cents.groupBy("label")
      .agg(sum((col("centroid") * col("centroid")).cast("decimal(27,15)")).as("nc"))
    val ex = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"), col("pos"), col("v").cast("double").as("v"))
    val agg = ex.join(broadcast(cents), Seq("label", "pos"))
      .groupBy("vec_id", "label")
      .agg(sum((col("v") * col("centroid")).cast("decimal(27,15)")).as("dotc"),
        sum((col("v") * col("v")).cast("decimal(27,15)")).as("nv"))
      // a zero-norm vector has no cosine to its centroid (ANSI 0/0)
      .filter(col("nv") > 0)
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cos_centroid").asc, col("vec_id").asc)
    agg.join(broadcast(nc), Seq("label"))
      .select(col("label"), col("vec_id"),
        round(col("dotc").cast("double") /
          (sqrt(col("nv").cast("double")) * sqrt(col("nc").cast("double"))), 6)
          .as("cos_centroid"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("label", "rn")
  }

  /** Int8-serving ANN: exact-cosine ranking in the QUANTIZED domain —
    * the 4×-smaller representation quantizeEmbeddings audits, actually
    * served. Each vector becomes 64 small integers (symmetric scalar
    * quantization, exactly-rounded IEEE ops only), and every score is
    * a dot product of exact small integers (≤ 64·127² ≪ 2^53, so the
    * double accumulation is EXACT in both engines) finished by one
    * deterministic sqrt/divide — no rounding discipline needed
    * anywhere before the final 6-dp presentation round. At 100 TB this
    * is the memory-bound serving win: the scan reads int8 codes, not
    * floats, and SIMD int8 dot products are the production kernel this
    * plan shape stands in for. */
  /** The int8 code table (vec_id, qd, nrm2) — a maintained index
    * artifact ("sq8Codes": built by writeIndexes, primed columnar,
    * appended row-wise on embedding ingest since the scale is
    * per-vector). The scale must be BOUND as a lambda variable, not
    * referenced as an outer projection column: CollapseProject
    * inlines the array_max into the per-element quantize lambda
    * otherwise and the max is recomputed 64× per row (the
    * q_text_bigrams quadratic-inline hazard — measured ~2× the
    * query). Memoizing the table also shares ONE quantization pass
    * between the query- and corpus-side scans (2.1 → ~0.3 s warm at
    * sf0.1). */
  private[operators] def sq8Codes(spark: SparkSession, dir: String): DataFrame =
    Dedup.memo(spark, s"sq8Codes|$dir") {
      Dedup.checkpointSer(sq8CodesPlan(spark, dir))
    }

  private[operators] def sq8CodesPlan(spark: SparkSession, dir: String): DataFrame =
    sq8CodesOf(Tables.embeddings(spark, dir))

  /** Row-wise quantization of an arbitrary embeddings slice (shared
    * by the memoized build and the ingest-append path). */
  private[operators] def sq8CodesOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      element_at(transform(
        array(array_max(transform(col("embedding"), x => abs(x.cast("double"))))),
        s => transform(col("embedding"), x =>
          when(s === 0d, lit(0.0))
            .otherwise(floor(x.cast("double") * lit(127.0) / s + lit(0.5))))),
        1).as("qd"))
      .withColumn("nrm2", dot(col("qd"), col("qd")))
      .filter(col("nrm2") > 0d)

  def knnSq8(spark: SparkSession, dir: String,
             nQueries: Int = NumQueriesDefault, k: Int = TopKDefault): DataFrame = {
    val qt = sq8Codes(spark, dir)
    val q = qt.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("qd").as("qd_q"), col("nrm2").as("n2_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    qt.select(col("vec_id").as("neighbor_id"), col("qd").as("qd_c"), col("nrm2").as("n2_c"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qd_q"), col("qd_c")) / (sqrt(col("n2_q")) * sqrt(col("n2_c")))).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos_q"), col("rn"))
      .orderBy("query_id", "rn")
  }

  /** IVF-pruned int8 serving — the FAISS `IndexIVFScalarQuantizer`
    * shape. [[knnSq8]]'s int8 scan is exact-rank (natural recall
    * 0.98–1.0 in the families report) but reads EVERY vector's codes
    * per query — the one ANN leg whose serving cost is still
    * corpus-linear, which does not survive 100 TB. This composes the
    * fitted coarse quantizer in front of it: probe the recall-tuned
    * nprobe cells (the persisted `ivfProbeTuned` budget), then score
    * int8 cosines over the probed cells' candidates only. Recall is
    * bounded by the probe (ivf_tuned's audited number) because SQ8
    * ranks are near-exact; cost drops from corpus × queries to
    * queries × (nprobe/kCells) × corpus.
    *
    * No refine stage on purpose: int8 cosine IS the final score in
    * the full-scan leg too (the families report shows sq8 ≈ exact),
    * so a full-precision rerank would re-fetch floats to reproduce
    * the ranking the codes already gave. Contrast knnIvfPqRefined,
    * where 4-bit ADC ranks genuinely need the exact rerank. */
  def knnIvfSq8(spark: SparkSession, dir: String,
                nQueries: Int = NumQueriesDefault, k: Int = TopKDefault): DataFrame = {
    val cents = SimilarityIvf.fitCentroids(spark, dir)
    val nprobe = SimilarityIvf.tunedProbe(spark, dir, k)
    val cands = broadcast(
        SimilarityIvf.queryProbes(spark, dir, cents, nprobe, nQueries))
      .join(SimilarityIvf.ivfCellsFit(spark, dir)
        .select(col("vec_id").as("neighbor_id"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val qt = sq8Codes(spark, dir)
    val q = qt.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("qd").as("qd_q"), col("nrm2").as("n2_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    // candidate pairs are queries × probed-cells sized — always the
    // broadcast side against the corpus code table
    qt.select(col("vec_id").as("neighbor_id"), col("qd").as("qd_c"), col("nrm2").as("n2_c"))
      .join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qd_q"), col("qd_c")) / (sqrt(col("n2_q")) * sqrt(col("n2_c")))).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos_q"), col("rn"))
      .orderBy("query_id", "rn")
  }

  /** RRF fusion constant (Cormack et al. 2009's k = 60). */
  private[operators] val RrfK = 60

  /** Hybrid lexical + dense retrieval with reciprocal-rank fusion:
    * for each query document, the shared-shingle Jaccard ranking (the
    * persisted pair table — the lexical leg) and the exact-cosine
    * embedding ranking (the dense leg) fuse as
    * Σ 1/(60 + rank) — the standard RRF combination modern retrieval
    * stacks run over BM25 + vector legs. The corpus's 1:1
    * doc_id ↔ vec_id alignment is what makes the fusion well-defined.
    *
    * Scale: the lexical leg reads the maintained pair artifact (no
    * new pair generation); the dense leg here is the exact scan for a
    * deterministic gate — production swaps in any of the oracled ANN
    * shortlists (LSH / IVF / PQ), which changes recall, not the
    * fusion. RRF scores are exact rationals evaluated identically in
    * both engines (two coalesced 1/(60+r) terms, one addition),
    * rounded at 6 dp with neighbor tie-break. */
  def hybridRrf(spark: SparkSession, dir: String,
                nQueries: Int = NumQueriesDefault, k: Int = TopKDefault): DataFrame = {
    val pj = Dedup.jaccardPairTable(spark, dir)
    val lex = pj.filter(col("id_a") < nQueries)
      .select(col("id_a").as("query_id"), col("id_b").as("neighbor_id"), col("jaccard"))
      .unionAll(pj.filter(col("id_b") < nQueries)
        .select(col("id_b").as("query_id"), col("id_a").as("neighbor_id"), col("jaccard")))
    val wl = Window.partitionBy(col("query_id"))
      .orderBy(col("jaccard").desc, col("neighbor_id").asc)
    val lexR = lex.withColumn("r_lex", row_number().over(wl))
      .select("query_id", "neighbor_id", "r_lex")
    val base = embBase(spark, dir)
    val q = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("v_q"), col("nrm").as("nrm_q"))
    val wd = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val denseR = base
      .select(col("vec_id").as("neighbor_id"), col("v").as("v_c"), col("nrm").as("nrm_c"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("v_q"), col("v_c")) / (col("nrm_q") * col("nrm_c"))).as("cos"))
      .withColumn("r_dense", row_number().over(wd))
      .select("query_id", "neighbor_id", "r_dense")
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("neighbor_id").asc)
    lexR.join(denseR, Seq("query_id", "neighbor_id"), "full_outer")
      .select(col("query_id"), col("neighbor_id"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("r_dense")), lit(0.0)), 6).as("rrf"))
      .withColumn("rn", row_number().over(wf))
      .filter(col("rn") <= k)
      .orderBy("query_id", "rn")
  }
}

object SimilarityIvf {
  import Similarity.{NumQueriesDefault, TopKDefault}

  private def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDotProduct(a, b)

  /** IVF coarse quantizer: K seeded random gaussian centroids
    * (magnitude is irrelevant for the cosine-style argmax). */
  private[operators] val NumCentroids = 16
  private[operators] val NumProbe = 4
  private[operators] val centroids: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(11)
    Seq.fill(NumCentroids, Similarity.Dim)(rnd.nextGaussian())
  }

  /** Corpus-proportional cell count for the FITTED quantizer:
    * k = clamp(4·⌈√N⌉, 16, 4096) — the FAISS sizing band (4√N–16√N
    * cells keeps expected cell population ∝ √N, so per-probe rerank
    * lists and the number of probes both grow as the square root of
    * the corpus instead of linearly). The 4096 cap marks where the
    * inline-literal centroid plan stops being sensible; past it the
    * model ships as a broadcast table (centroidTable already persists
    * exactly that artifact). One COUNT over the ids-only scan, cached
    * per (session, dir). */
  private val kCache =
    graft.sources.SessionSweep.scoped(new java.util.concurrent.ConcurrentHashMap[String, Integer]())
  private[operators] def kForCount(n: Long): Int =
    math.max(16, math.min(4096,
      4 * math.ceil(math.sqrt(n.toDouble)).toInt))
  private[operators] def corpusK(spark: SparkSession, dir: String): Int =
    kCache.computeIfAbsent(s"${Dedup.sessionKey(spark)}|$dir", _ =>
      kForCount(Tables.embeddings(spark, dir).count())).intValue()

  /** Drop the cached corpus-proportional cell count — the re-index
    * verb must re-derive k from the CURRENT corpus, not the count the
    * session saw at its first fit. */
  private[operators] def invalidateCorpusK(spark: SparkSession, dir: String): Unit =
    kCache.remove(s"${Dedup.sessionKey(spark)}|$dir")

  /** Probe count scaled to the cell count (k/8 cells ≈ 12.5 % of the
    * corpus as candidates, floored at the seeded default) — holding
    * nprobe constant while k grows would silently trade the larger k
    * for recall. */
  private[operators] def probeFor(k: Int): Int = math.max(NumProbe, k / 8)

  private def centroidDots(v: Column, cents: Seq[Seq[Double]]): Column =
    array(cents.map(c => dot(v, typedLit(c))): _*)

  /** Query side: probe the `nprobe` nearest cells (standard IVF
    * recall knob — a vector near a cell boundary is found through the
    * neighboring probes). */
  private def probedCells(v: Column, cents: Seq[Seq[Double]],
                          nprobe: Int = NumProbe): Column =
    transform(
      slice(reverse(array_sort(arrays_zip(
        centroidDots(v, cents), sequence(lit(1), lit(cents.length))))), 1, nprobe),
      s => s.getField("1").cast("int"))

  /** Materialized IVF cell index (vec_id, cell) — ids only, built once
    * per (session, dir). The centroid-dot array is staged behind a
    * short-lived checkpoint so argmax's two references (array_position
    * + array_max) read a bound attribute instead of re-evaluating the
    * 16×64 dot products twice (CollapseProject inlines single-use
    * aliases); the staging blocks are freed as soon as the id table
    * materializes. */
  /** Literal-plan cutoff: up to this many cells the centroid dots are
    * compiled into the plan as literals (zero side input, the oracle-
    * friendly shape); above it the assignment switches to a broadcast
    * centroid-table join — codegen of a k-literal dot array grows (and
    * recompiles) linearly with k, measured ~2 s of per-build overhead
    * at k=180, while the join plan is k-independent. The join is also
    * the only shape that survives past the 4096-cell literal cap. */
  private val LiteralAssignMaxK = 32

  /** Broadcast-join argmax assignment: (vec × cell) dot products from
    * a broadcast centroid table, then one hash-agg argmax per vector.
    * Bit-identical to the literal path — same ArrayDotProduct on the
    * same doubles per (vector, centroid) pair, and the lexicographic
    * max over (dt, −cell) reproduces array_position's first-max =
    * smallest-cell tie-break. */
  private def assignViaJoin(spark: SparkSession, base: DataFrame,
                            cents: Seq[Seq[Double]]): DataFrame = {
    val centDf = spark.createDataFrame(
        cents.zipWithIndex.map { case (c, i) => (i + 1, c) })
      .toDF("cell", "centroid")
    base.select(col("vec_id"), col("v"))
      .crossJoin(broadcast(centDf))
      .select(col("vec_id"), col("cell"), dot(col("v"), col("centroid")).as("dt"))
      .groupBy("vec_id")
      .agg(max(struct(col("dt"), (-col("cell")).as("negcell"))).as("m"))
      .select(col("vec_id"), (-col("m.negcell")).cast("int").as("cell"))
  }

  /** Query-side probed cells as a (query_id, cell) table — the
    * candidate-pruning head annIvfWith and the IVF+PQ composition in
    * Pq.scala share. */
  private[operators] def queryProbes(spark: SparkSession, dir: String,
                                     cents: Seq[Seq[Double]], nprobe: Int,
                                     nQueries: Int): DataFrame =
    queryProbesOf(
      Similarity.embBase(spark, dir).filter(col("vec_id") < nQueries),
      cents, nprobe)

  /** Query-side literal-plan cutoff — wider than the corpus-side
    * LiteralAssignMaxK because the query batch is small (the codegen
    * cost is per-PLAN, amortized over few rows, and the literal shape
    * keeps test-scale plans unchanged), but bounded: at the 200k-tier
    * probe (k = 1792) the literal probe expression cost ~8 minutes of
    * tuner wall where the join formulation is seconds. */
  private val LiteralProbeMaxK = 256

  /** Probed cells for an ARBITRARY embBase-shaped query batch — the
    * online-serving head ([[Similarity.annServeBatchIvf]]) and every
    * corpus-query probe site. Past [[LiteralProbeMaxK]] cells the
    * literal expression switches to a broadcast centroid-table join:
    * same ArrayDotProduct on the same doubles, and the window's
    * (dt DESC, cell DESC) order reproduces probedCells' reversed
    * ascending (dot, cell) sort — bit-identical cells, k-independent
    * codegen. */
  private[operators] def queryProbesOf(qb: DataFrame, cents: Seq[Seq[Double]],
                                       nprobe: Int): DataFrame =
    if (cents.length <= LiteralProbeMaxK) {
      qb.select(col("vec_id").as("query_id"),
        explode(probedCells(col("v"), cents, nprobe)).as("cell"))
    } else {
      val centDf = qb.sparkSession.createDataFrame(
          cents.zipWithIndex.map { case (c, i) => (i + 1, c) })
        .toDF("cell", "centroid")
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("dt").desc, col("cell").desc)
      qb.select(col("vec_id").as("query_id"), col("v"))
        .crossJoin(broadcast(centDf))
        .select(col("query_id"), col("cell"),
          dot(col("v"), col("centroid")).as("dt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= nprobe)
        .select("query_id", "cell")
    }

  private[graft] def ivfCells(spark: SparkSession, dir: String,
                              cents: Seq[Seq[Double]] = centroids,
                              memoKey: String = ""): DataFrame = {
    val key = if (memoKey.nonEmpty) memoKey else s"ivfCells|$dir"
    Dedup.memo(spark, key) {
      if (cents.length > LiteralAssignMaxK) {
        assignViaJoin(spark, Similarity.embBase(spark, dir), cents)
          .transform(Dedup.checkpointSer)
      } else {
        val (staged, stagedIds) = Dedup.trackedCheckpoint(
          Similarity.embBase(spark, dir)
            .select(col("vec_id"), centroidDots(col("v"), cents).as("dots")))
        val out = staged
          .select(col("vec_id"),
            array_position(col("dots"), array_max(col("dots"))).cast("int").as("cell"))
          .transform(Dedup.checkpointSer)
        Dedup.unpersistIds(spark, stagedIds)
        out
      }
    }
  }

  /** The argmax-cell assignment of a vector column as ONE expression
    * tree — shared with the streaming semantic ingest probe (a stream
    * cannot checkpoint staging projections, and a byte-identical
    * assignment expression is what makes a stream probe land in the
    * same cells as the persisted index). The dot array is evaluated
    * twice after CollapseProject inlining — acceptable for batch-sized
    * stream inputs, the ivfAssign argument. */
  private[graft] def cellExpr(v: Column,
                              cents: Seq[Seq[Double]] = centroids): Column = {
    val dots = centroidDots(v, cents)
    array_position(dots, array_max(dots)).cast("int")
  }

  /** Row-wise IVF cell assignment over an arbitrary (vec_id, v, …)
    * base slice — the core Dedup.appendIndexes uses to assign an
    * ingest batch under a FIXED quantizer. No checkpoint staging: for
    * a batch-sized input the double evaluation of the dot array
    * (argmax reads it twice after CollapseProject inlining) is cheaper
    * than a materialization round-trip; the memoized corpus-wide build
    * above keeps its staged form. Values are bit-identical either
    * way. */
  private[graft] def ivfAssign(base: DataFrame, cents: Seq[Seq[Double]]): DataFrame =
    if (cents.length > LiteralAssignMaxK)
      assignViaJoin(base.sparkSession, base, cents)
    else
      base.select(col("vec_id"), centroidDots(col("v"), cents).as("dots"))
        .select(col("vec_id"),
          array_position(col("dots"), array_max(col("dots"))).cast("int").as("cell"))

  /** The fitted coarse quantizer as a persistable table (cell,
    * centroid) — 16 rows of 64 doubles. This is the model artifact a
    * 100 TB deployment trains once and ships with the cell index:
    * primeIndexes loads it back and fitCentroids serves it from the
    * session cache instead of refitting, so a fresh analysis session
    * does zero k-means and zero cell assignment. Cell ids are 1-based,
    * matching array_position in the assignment scan. */
  private[operators] def centroidTable(spark: SparkSession, dir: String): DataFrame =
    Dedup.memo(spark, s"ivfCentroidsFit|$dir") {
      val cents = fitCentroids(spark, dir)
      spark.createDataFrame(cents.zipWithIndex.map { case (c, i) => (i + 1, c) })
        .toDF("cell", "centroid")
    }

  /** Materialized cell index under the FITTED quantizer — the memo
    * twin annIvfFitted rides, exposed as a named artifact so
    * writeIndexes/primeIndexes/appendIndexes maintain it alongside the
    * seeded one. */
  private[operators] def ivfCellsFit(spark: SparkSession, dir: String): DataFrame =
    ivfCells(spark, dir, fitCentroids(spark, dir), s"ivfCellsFit|$dir")

  /** Load the persisted fitted-quantizer artifact, if present — the
    * append path assigns new batches under these centroids (train-once
    * posture; a refit would put old and new rows in different cell
    * geometries). */
  private[operators] def readCentroidArtifact(spark: SparkSession,
                                              indexDir: String): Option[Seq[Seq[Double]]] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/ivfCentroidsFit.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(p.toString).orderBy("cell").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toSeq).toSeq)
  }

  /** Cached sampled-k-means centroid fits per (session, dir): the
    * model is 16×64 doubles — negligible — so unlike the index tables
    * it needs no eviction discipline. */
  private val fitCache =
    graft.sources.SessionSweep.scoped(new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Double]]]())

  /** Test hook: drop every cached fitted model, so a persistence
    * round-trip can prove fitCentroids serves the parquet artifact
    * rather than the in-process cache. */
  private[operators] def clearFitCache(): Unit = fitCache.clear()

  /** Drop this (session, dir)'s cached fitted models. Called by
    * Dedup.primeIndexes when it primes a persisted quantizer: the
    * artifact must win over any model fitted in-session earlier,
    * otherwise query-side probes (fitCache) and the primed cell index
    * (parquet) would sit in DIFFERENT cell geometries and recall would
    * silently collapse. */
  private[operators] def invalidateFit(spark: SparkSession, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val prefix = s"${Dedup.sessionKey(spark)}|$dir|"
    fitCache.keySet.asScala.filter(_.startsWith(prefix))
      .foreach(fitCache.remove)
  }

  /** Coarse-quantizer training: Lloyd's k-means on a deterministic
    * hash-ordered sample of the corpus, fitted driver-side. This is
    * the standard IVF training shape at any scale (FAISS-style coarse
    * quantizers train on samples, not the corpus): the executors ship
    * only `sampleN` vectors (≈ 128 KB here) and the fitted model goes
    * back into the plan as literals, so the cell-assignment scan is
    * unchanged. The hash-ordered draw makes the fit reproducible
    * across runs and repartitionings — no RNG state. Empty clusters
    * re-seed from the sample (hash order), so exactly k centroids
    * always come back. */
  private[graft] def fitCentroids(spark: SparkSession, dir: String,
                                      k: Int = 0, sampleN: Int = 0,
                                      iters: Int = 5): Seq[Seq[Double]] = {
    // k = 0 (the default request) resolves to the corpus-proportional
    // cell count; an explicit k pins the geometry (tests, experiments)
    val kReq = if (k > 0) k else corpusK(spark, dir)
    val key = s"${Dedup.sessionKey(spark)}|$dir|$kReq"
    val hit = fitCache.get(key)
    if (hit != null) return hit
    // A session primed from parquet serves the persisted quantizer
    // (k rows — a negligible collect) instead of refitting: the model
    // travels with the cell index, so assignments and probes stay in
    // one cell geometry across sessions and appends. Only default
    // requests consult the artifact — an explicit k asks for a
    // specific geometry, which a foreign artifact cannot satisfy.
    if (k == 0) {
      Dedup.memoGet(spark, s"ivfCentroidsFit|$dir").foreach { df =>
        val cents = df.orderBy("cell").collect()
          .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toSeq).toSeq
        if (cents.nonEmpty) { fitCache.put(key, cents); return cents }
      }
    }
    // the training sample scales with the requested cells (≥16 points
    // per centroid, floored at the legacy 512) — fitting 4√N cells on
    // a fixed 512-row draw would leave most cells with <4 points
    val sampleEff = if (sampleN > 0) sampleN else math.max(512, 16 * kReq)
    val sample = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      .limit(sampleEff)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(sample.nonEmpty, s"cannot fit IVF centroids: $dir/embeddings is empty")
    // fewer rows than requested cells → fit what the data supports
    // (indexing over k > n is well-defined with kEff cells, whereas
    // centroids(c) past the sample would throw)
    val kEff = math.min(kReq, sample.length)
    var centroids: Array[Array[Double]] = sample.take(kEff).map(_.clone())
    // The assignment step is O(sample × k × dim) per iteration —
    // single-threaded it reads ~minutes at the 200k-vector tier
    // (k = 1792) and extrapolates to hours at the k = 4096 cap, for a
    // loop that parallelizes embarrassingly. Determinism is
    // PER-VERSION: the sample splits into FIXED chunks, each chunk
    // accumulates its own sums/counts, and chunks merge in chunk-index
    // order — the per-centroid addition order is a pure function of
    // the (hash-ordered) sample order, never of thread scheduling, so
    // every run of THIS code yields the same bits. It is NOT
    // bit-compatible with the pre-chunked sequential loop (per-chunk
    // partial sums reassociate the float additions); cross-session
    // cell-geometry stability is guaranteed by the persisted
    // ivfCentroidsFit artifact, not by refitting.
    import scala.collection.parallel.CollectionConverters._
    val dim = centroids(0).length
    val nChunks = math.min(32, math.max(1, sample.length / 256))
    val chunks = sample.grouped(
      math.max(1, (sample.length + nChunks - 1) / nChunks)).toArray
    (1 to iters).foreach { _ =>
      val cents = centroids
      val partials = chunks.zipWithIndex.par.map { case (chunk, _) =>
        val sums = Array.fill(kEff)(new Array[Double](dim))
        val counts = new Array[Long](kEff)
        chunk.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < kEff) {
            var d = 0.0; var i = 0
            while (i < v.length) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < v.length) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        (sums, counts)
      }.toArray // .toArray keeps chunk order; merge below is sequential
      val sums = Array.fill(kEff)(new Array[Double](dim))
      val counts = new Array[Long](kEff)
      partials.foreach { case (ps, pc) =>
        var c = 0
        while (c < kEff) {
          var i = 0
          while (i < dim) { sums(c)(i) += ps(c)(i); i += 1 }
          counts(c) += pc(c); c += 1
        }
      }
      centroids = (0 until kEff).map { c =>
        if (counts(c) == 0) sample(c % sample.length).clone()
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    val out = centroids.map(_.toSeq).toSeq
    fitCache.put(key, out)
    out
  }

  /** annIvf with centroids trained by the sampled k-means fit instead
    * of seeded gaussians — same plan shape, data-adapted cells (the
    * production configuration the seeded variant stands in for).
    * Rows-only for the driver; planted recall pinned in
    * SimilaritySpec. */
  def annIvfFitted(spark: SparkSession, dir: String,
                   nQueries: Int = NumQueriesDefault, k: Int = TopKDefault): DataFrame = {
    val cents = fitCentroids(spark, dir)
    annIvfWith(spark, dir, cents, s"ivfCellsFit|$dir", nQueries, k,
      probeFor(cents.length))
  }

  /** Serving recall target for the TUNED probe budget. 0.8 mean
    * recall@k is the floor a retrieval shortlist is usually considered
    * servable at; the default k/8 heuristic measured 0.58 on natural
    * queries (annRecallReport, round 11) — the report existed, the
    * knob it should drive didn't. */
  private[operators] val RecallTarget = 0.8

  /** Held-out tuning queries: the [[TuneHeldOut]] vectors AFTER the
    * serving prefix, so the budget is chosen on queries the serving
    * set never sees (tuning on the served queries would overfit the
    * reported recall). */
  private[operators] val TuneHeldOut = 16

  private val probeTuneCache =
    graft.sources.SessionSweep.scoped(new java.util.concurrent.ConcurrentHashMap[String, Integer]())

  /** Mean recall@k of the nprobe-budget IVF shortlist against the
    * exact top-k, over queries in [loQ, hiQ) — the measurement leg of
    * the probe tuner. One bounded scalar per evaluation; all joins are
    * the serving joins (broadcast query side, equi-join on cell). */
  /** Exact ground-truth top-k for the held-out tuning queries — built
    * ONCE per ladder walk (it does not depend on nprobe) and passed
    * into every rung's evaluation; re-deriving it per rung measured
    * 4-8 redundant corpus-sized kNN jobs on the first tuned call. */
  private[operators] def tuneGroundTruth(spark: SparkSession, dir: String,
                                         loQ: Long, hiQ: Long, k: Int): DataFrame = {
    val base = Similarity.embBase(spark, dir)
    val qpred = col("vec_id") >= loQ && col("vec_id") < hiQ
    val qv = base.filter(qpred)
      .select(col("vec_id").as("query_id"), col("v").as("v_q"), col("nrm").as("nrm_q"))
    val cv = base.select(col("vec_id").as("neighbor_id"),
      col("v").as("v_c"), col("nrm").as("nrm_c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(qv).join(cv, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("v_q"), col("v_c")) / (col("nrm_q") * col("nrm_c"))).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id")
  }

  /** The held-out exact top-k SHARED by the three tune walks (IVF
    * nprobe, LSH radius, PQ rerank shortlist): they tune against the
    * identical (lo, hi, k) sample, so the ground truth is one table —
    * and the walks run as concurrent index chains, so the memo's
    * per-key lock makes the first arrival build the brute-force kNN
    * and the other two serve it (three corpus-sized ground-truth jobs
    * → one per index build). Lifetime is the memo's (releaseIndexes /
    * the session), not a single walk — a tiny (hi−lo)·k-row table. */
  private[operators] def sharedTuneTruth(spark: SparkSession, dir: String,
                                         lo: Long, hi: Long, k: Int): DataFrame =
    Dedup.memo(spark, s"tuneTruth|$dir|$lo|$hi|$k") {
      Dedup.checkpointSer(tuneGroundTruth(spark, dir, lo, hi, k))
    }

  private def meanRecallAt(spark: SparkSession, dir: String,
                           cents: Seq[Seq[Double]], nprobe: Int,
                           loQ: Long, hiQ: Long, k: Int,
                           exact: DataFrame): Double = {
    val base = Similarity.embBase(spark, dir)
    val qpred = col("vec_id") >= loQ && col("vec_id") < hiQ
    val qv = base.filter(qpred)
      .select(col("vec_id").as("query_id"), col("v").as("v_q"), col("nrm").as("nrm_q"))
    val cv = base.select(col("vec_id").as("neighbor_id"),
      col("v").as("v_c"), col("nrm").as("nrm_c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val cells = ivfCells(spark, dir, cents, s"ivfCellsFit|$dir")
    val qcells = queryProbesOf(base.filter(qpred), cents, nprobe)
    val cand = broadcast(qcells)
      .join(cells.select(col("vec_id").as("neighbor_id"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val approx = broadcast(qv).join(cand, Seq("query_id")).join(cv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("v_q"), col("v_c")) / (col("nrm_q") * col("nrm_c"))).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id")
    val stats = exact.join(approx.withColumn("hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n"), count(col("hit")).as("hits"))
      .collect()(0)
    val n = stats.getLong(0)
    // zero ground-truth rows = NO measurement — report 0 so a caller's
    // recall-target search can never "pass" on an empty sample (1.0
    // here made tunedProbe serve the minimal budget untested; the
    // empty case is now short-circuited to probe-all upstream)
    if (n == 0) 0.0 else stats.getLong(1).toDouble / n
  }

  /** Recall-targeted probe budget: the smallest nprobe on a doubling
    * ladder from the k/8 heuristic whose mean recall@k on the
    * held-out natural-query sample reaches [[RecallTarget]] — the
    * probeForFiltered discipline (derive the knob from a measurement,
    * not an assumed constant), driven by the annRecallReport
    * measurement loop. Probing every cell is exhaustive search, so
    * the ladder's last rung always satisfies any target ≤ 1; the
    * chosen budget is memoized per (session, dir, k) like the fitted
    * quantizer it serves under. */
  private[operators] def tunedProbe(spark: SparkSession, dir: String,
                                    k: Int = TopKDefault): Int = {
    val key = s"${Dedup.sessionKey(spark)}|$dir|$k"
    val hit = probeTuneCache.get(key)
    if (hit != null) return hit.intValue()
    // artifact-wins: a primed ivfProbeTuned table (the ladder walk run
    // once by the index job, persisted next to the quantizer it was
    // tuned under) serves the budget without re-running the held-out
    // exact-kNN ground truth — the round-12 tuner re-walked the ladder
    // per SESSION, which at 100 TB is a corpus-sized kNN per restart.
    // Staleness contract = the fitted quantizer's: appends extend the
    // corpus under the same centroids, so the tuned budget drifts only
    // as far as the quantizer itself does; writeIndexes re-derives
    // both together.
    Dedup.memoGet(spark, s"ivfProbeTuned|$dir").foreach { tbl =>
      val row = tbl.filter(col("k") === k).select("nprobe").collect()
      if (row.nonEmpty) {
        val np = row(0).getInt(0)
        probeTuneCache.put(key, np)
        return np
      }
    }
    computeTunedProbe(spark, dir, k, key)
  }

  /** The ladder walk itself — what the index job persists and an
    * unprimed session falls back to. */
  private def computeTunedProbe(spark: SparkSession, dir: String,
                                k: Int, key: String): Int = {
    val cents = fitCentroids(spark, dir)
    val kCells = cents.length
    val lo = NumQueriesDefault.toLong
    val hi = lo + TuneHeldOut
    val ladder = Iterator.iterate(probeFor(kCells))(_ * 2)
      .takeWhile(_ < kCells).toSeq :+ kCells
    val truth = sharedTuneTruth(spark, dir, lo, hi, k)
    val chosen =
      if (truth.isEmpty) {
        // the held-out id range [lo, hi) yielded no ground-truth
        // rows (tiny corpus, or ids that don't cover the range):
        // there is nothing to tune AGAINST, so serve exhaustive
        // probing — correct at any recall target — instead of
        // letting an unmeasured minimal budget pass as "tuned"
        System.err.println(
          s"[tunedProbe] empty held-out sample for $dir ids [$lo,$hi) — " +
            s"falling back to probe-all ($kCells cells)")
        kCells
      } else ladder.find(p =>
        meanRecallAt(spark, dir, cents, p, lo, hi, k, truth) >= RecallTarget)
        .getOrElse(kCells)
    probeTuneCache.put(key, chosen)
    chosen
  }

  /** The ivfProbeTuned index artifact: the serving-configuration row
    * (k, nprobe) the recall-targeted walk chose — train-once, tiny,
    * persisted by writeIndexes in the IVF chain (after the centroids
    * and cell table it is tuned under) and served by primeIndexes so
    * a primed session never re-runs the held-out ground-truth kNN. */
  private[operators] def probeTunedTable(spark: SparkSession, dir: String): DataFrame = {
    val k = TopKDefault
    val np = computeTunedProbe(spark, dir, k,
      s"${Dedup.sessionKey(spark)}|$dir|$k")
    val s2 = spark
    import s2.implicits._
    Seq((k, np)).toDF("k", "nprobe")
  }

  /** Drop this session's in-memory tuned budgets for `dir` — called on
    * priming so a persisted artifact always wins over a budget walked
    * earlier in the session (the invalidateFit discipline). */
  private[operators] def invalidateProbeTune(spark: SparkSession, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val prefix = s"${Dedup.sessionKey(spark)}|$dir|"
    probeTuneCache.keySet.asScala.filter(_.startsWith(prefix))
      .foreach(probeTuneCache.remove)
  }

  /** [[annIvfFitted]] with the probe budget TUNED to the recall
    * target instead of the k/8 heuristic — the serving configuration
    * the recall report asked for. Same plan shape; only nprobe (a
    * query-side literal) changes, so the marginal cost of the higher
    * recall is more candidate rows through the same rerank. */
  def annIvfTuned(spark: SparkSession, dir: String,
                  nQueries: Int = NumQueriesDefault, k: Int = TopKDefault): DataFrame = {
    val cents = fitCentroids(spark, dir)
    annIvfWith(spark, dir, cents, s"ivfCellsFit|$dir", nQueries, k,
      tunedProbe(spark, dir, k))
  }

  /** Approximate top-k via IVF: candidate pairs from the ids-only cell
    * index (equi-join on the cell id), exact cosine rerank via vector
    * join-back. Rows-only for the driver (centroid seeds are
    * Spark-side); planted-duplicate recall pinned in SimilaritySpec.
    *
    * Scale posture vs LSH: IVF moves each corpus vector into exactly
    * ONE cell (vs T bucket copies), so the index shuffle is 1× the
    * corpus; recall is bought at query time via nprobe (annIvfFitted
    * swaps in sampled-k-means centroids — same plan). */
  def annIvf(spark: SparkSession, dir: String,
             nQueries: Int = NumQueriesDefault, k: Int = TopKDefault): DataFrame =
    annIvfWith(spark, dir, centroids, s"ivfCells|$dir", nQueries, k)

  private def annIvfWith(spark: SparkSession, dir: String, cents: Seq[Seq[Double]],
                         memoKey: String, nQueries: Int, k: Int,
                         nprobe: Int = NumProbe): DataFrame = {
    val base = Similarity.embBase(spark, dir)
    val cells = ivfCells(spark, dir, cents, memoKey)
    val qcells = queryProbesOf(base.filter(col("vec_id") < nQueries), cents, nprobe)
    val pairs = broadcast(qcells)
      .join(cells.select(col("vec_id").as("neighbor_id"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    Similarity.rerankTopK(base, pairs, nQueries, k)
  }

  /** Label bound for the registered filtered-ANN query: neighbors are
    * constrained to `label < 5` (half the 10-label corpus) — a stand-in
    * for any candidate-stage predicate (tenant id, language, license
    * class). */
  private[operators] val FilterLabelMax = 5

  /** Predicate-constrained ANN ("filtered search", the most common
    * real serving ask): top-k among corpus vectors satisfying the
    * label predicate, under the FITTED corpus-proportional quantizer.
    *
    * The filter applies INSIDE the candidate stage — the ids-only cell
    * index joins the (vec_id, label) projection and drops excluded
    * vectors BEFORE the candidate join and rerank (pre-filter
    * semantics). The alternative, filtering after the top-k, silently
    * returns < k rows whenever the unfiltered top-k is dominated by
    * out-of-predicate neighbors; pre-filtering keeps the full k from
    * the allowed population at the same probe cost. Recall vs the
    * post-filter exact twin is pinned in SimilaritySpec; the driver
    * oracle replays the whole plan (fitted centroids inlined at dump
    * time + the same label join) hash-exact.
    *
    * Scale posture: the label projection joins the cell index on
    * vec_id (both ids-only, co-partitionable artifacts); the probed
    * candidate join stays an equi-join on cell. Selective predicates
    * shrink every downstream stage — exactly where a 100 TB filtered
    * search wants the filter. */
  /** Headroom multiplier on the selectivity-scaled probe budget,
    * measured against the post-filter exact twin (recall@5 ≥ 0.8
    * pinned in SimilaritySpec across planted selectivities — the
    * corpus is weakly clustered, so boundary neighbors need extra
    * probes beyond the pure population argument; 1.5 held 0.8 only at
    * the fixture's selectivity and dropped to 0.74 at selectivity 1,
    * where the filtered search degenerates to plain IVF). */
  private[operators] val FilteredProbeHeadroom = 2.5

  /** Cached per-(session, dir) label histograms — a labels-row model
    * read (like the centroid fits), NOT a per-query corpus scan. */
  private val labelHistCache =
    graft.sources.SessionSweep.scoped(new java.util.concurrent.ConcurrentHashMap[String, Map[Int, Long]]())

  /** Label histogram of the embeddings table: the (tiny) statistics
    * artifact selectivity decisions read. One narrow groupBy per
    * (session, dir); at 100 TB this is table statistics maintained by
    * the index job, not query work. */
  private[operators] def labelHistogram(spark: SparkSession, dir: String): Map[Int, Long] =
    labelHistCache.computeIfAbsent(s"${Dedup.sessionKey(spark)}|$dir", _ =>
      Tables.embeddings(spark, dir)
        .groupBy("label").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)

  /** Probe budget under a predicate: the allowed population per probed
    * cell shrinks by the predicate's selectivity, so the probe count
    * grows by its inverse — with the selectivity DERIVED from the
    * observed label histogram (sum of allowed-label counts over the
    * total), not from any assumed label arity. A fixed nprobe would
    * thin every candidate list by the filter and recall would fall
    * with selectivity; a hard-coded arity would silently mis-budget
    * any corpus whose labels aren't the fixture's. Capped at k
    * (probe-everything degenerates to exact search over the filtered
    * corpus — the correct limit for ultra-selective predicates, and
    * the safe answer when the predicate matches nothing). */
  private[operators] def probeForFiltered(spark: SparkSession, dir: String,
                                          k: Int, labelMax: Int): Int = {
    val hist = labelHistogram(spark, dir)
    val total = hist.values.sum
    val allowed = hist.collect { case (l, n) if l < labelMax => n }.sum
    if (total == 0L || allowed == 0L) k
    else {
      val selectivity = allowed.toDouble / total
      math.min(k,
        math.ceil(probeFor(k) * FilteredProbeHeadroom / selectivity).toInt)
    }
  }

  def annIvfFiltered(spark: SparkSession, dir: String,
                     nQueries: Int = NumQueriesDefault, k: Int = TopKDefault,
                     labelMax: Int = FilterLabelMax): DataFrame = {
    val cents = fitCentroids(spark, dir)
    val base = Similarity.embBase(spark, dir)
    val cells = ivfCells(spark, dir, cents, s"ivfCellsFit|$dir")
    val allowed = Tables.embeddings(spark, dir)
      .filter(col("label") < labelMax)
      .select(col("vec_id"))
    val filteredCells = cells.join(allowed, Seq("vec_id"))
      .select(col("vec_id").as("neighbor_id"), col("cell"))
    val qcells = queryProbesOf(base.filter(col("vec_id") < nQueries), cents,
      probeForFiltered(spark, dir, cents.length, labelMax))
    val pairs = broadcast(qcells)
      .join(filteredCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    Similarity.rerankTopK(base, pairs, nQueries, k)
  }

  /** Fraction of each IVF cell dropped as "too prototypical" by
    * [[prototypePrune]]. Sorscher et al. keep ~75-80 % on large
    * datasets; 0.25 keeps the registered query in that regime. */
  private[operators] val PrototypeFrac = 0.25

  /** Euclidean norms of the seeded centroids, computed once driver-side
    * and inlined as the SAME double literal into both the Spark plan
    * and the DuckDB oracle — norm parity by construction instead of by
    * matching two engines' fold orders. */
  private[operators] def centroidNorms(cents: Seq[Seq[Double]]): Seq[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum))

  /** Per-vector prototypicality: cosine to the centroid of the
    * vector's own IVF cell — the SSL self-supervised prototype metric
    * of Sorscher et al. 2022 ("Beyond neural scaling laws",
    * arXiv:2206.14486) with the corpus's maintained coarse quantizer
    * standing in for the paper's k-means-on-SSL-embeddings. Rides the
    * memoized embBase + ivfCells artifacts (at 100 TB the assignment
    * is the scheduled index job); the 16-row centroid table is a
    * broadcast, so the scan stays shuffle-free until the ranking. */
  private[operators] def prototypeScores(spark: SparkSession, dir: String,
      cents: Seq[Seq[Double]] = centroids): DataFrame = {
    val norms = centroidNorms(cents)
    val centDf = spark.createDataFrame(
        cents.zipWithIndex.map { case (c, i) => (i + 1, c, norms(i)) })
      .toDF("cell", "cv", "cnorm")
    Similarity.embBase(spark, dir)
      .join(ivfCells(spark, dir), Seq("vec_id"))
      .join(broadcast(centDf), Seq("cell"))
      .select(col("cell"), col("vec_id"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cnorm")), 6)
          .as("proto_cos"))
  }

  /** E3/curation: SSL-prototype pruning (Sorscher et al. 2022) — rank
    * every vector by prototypicality WITHIN its IVF cell and emit the
    * most prototypical `frac` of each cell as the drop list (on large
    * corpora the easy, near-centroid examples are the redundant ones;
    * the paper's scaling-law-beating criterion). Emitting drops rather
    * than survivors keeps the output the audit artifact a curation
    * pipeline reviews and subtracts.
    *
    * One hash-partitioned window per cell (rank + count in a single
    * Exchange), ranking on the ROUNDED cosine with vec_id tiebreak so
    * both engines order identical doubles. */
  def prototypePrune(spark: SparkSession, dir: String,
                     frac: Double = PrototypeFrac): DataFrame = {
    val w = Window.partitionBy(col("cell"))
    val ranked = prototypeScores(spark, dir)
      .withColumn("cell_rank", row_number().over(
        w.orderBy(col("proto_cos").desc, col("vec_id").asc)))
      .withColumn("cell_n", count(lit(1)).over(w))
    ranked.filter(col("cell_rank") <= floor(lit(frac) * col("cell_n")))
      .select(col("cell"), col("vec_id"), col("proto_cos"),
        col("cell_rank"), col("cell_n"))
      .orderBy(col("cell"), col("cell_rank"))
  }

  /** Shared DuckDB CTE text (no leading WITH): norm-filtered
    * double-cast vectors `e0`, the seeded centroid VALUES (with
    * driver-computed norms inlined as the same doubles the Spark plan
    * multiplies by), the dot table `d`, and the argmax cell assignment
    * `assign` — the SQL twin every IVF-cell-blocked oracle (semantic
    * dedup, prototype pruning, D4) opens with. */
  private[operators] def assignCteSql: String = assignCteSqlWith(centroids)

  /** [[assignCteSql]] under an arbitrary quantizer — the fitted-model
    * oracles (q_knn_ivf_fit discipline) inline the FITTED centroids
    * at Verify dump time. */
  private[operators] def assignCteSqlWith(cents: Seq[Seq[Double]]): String = {
    def listLit(xs: Seq[Double]): String = xs.mkString("[", ", ", "]")
    val norms = centroidNorms(cents)
    val rows = cents.zipWithIndex
      .map { case (c, i) => s"(${i + 1}, ${listLit(c)}::DOUBLE[], ${norms(i)})" }
      .mkString(",\n    ")
    s"""e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |       WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
       |                              CAST(embedding AS DOUBLE[])) > 0),
       |cents(cell, cv, cnorm) AS (VALUES
       |    $rows),
       |d AS (SELECT vec_id, cell, list_dot_product(v, cv) AS dt FROM e0 CROSS JOIN cents),
       |assign AS (SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dt DESC, cell ASC) AS rn
       |    FROM d) WHERE rn = 1)""".stripMargin
  }

  /** ANN serving-quality report: per-query recall@k of the FITTED IVF
    * shortlist against the exact top-k — the eval a deployed index
    * publishes next to its latency (a probe budget that silently
    * degrades recall is how ANN serving rots). Rides the two already-
    * verified legs (knnExact, annIvfFitted); the report itself is a
    * left join on (query, neighbor) + one bounded hash agg, so its
    * cost at any scale is the legs' cost. Oracle: both legs' SQL
    * nested as subqueries (the fitted-centroid literals resolved at
    * dump time), so recall is hash-checked end to end, not spec-only.
    */
  def annRecallReport(spark: SparkSession, dir: String,
                      k: Int = TopKDefault): DataFrame = {
    val ex = Similarity.knnExact(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val ap = annIvfFitted(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    ex.join(ap, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(col("hit")).as("n_hits"))
      .select(col("query_id"), col("n_hits"),
        round(col("n_hits").cast("double") / k, 6).as("recall_at_k"))
      .orderBy("query_id")
  }

  /** IVF index-health audit: per-cell population, share of corpus,
    * and skew vs the even-split ideal (skew = n·K/total; 1.0 = evenly
    * loaded, ≫1 = a fat cell whose rerank candidate lists are growing,
    * missing cell = empty and its probes are wasted). The operational
    * check a maintained ANN/semantic index runs after every append and
    * before re-sizing k; rides the memoized/primable ivfCells
    * artifact, one hash-agg + a 1-row broadcast total. */
  def ivfStats(spark: SparkSession, dir: String): DataFrame = {
    val cells = ivfCells(spark, dir)
    val tot = cells.agg(count(lit(1)).as("total"))
    cells.groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        min("vec_id").as("min_vec_id"), max("vec_id").as("max_vec_id"))
      .crossJoin(broadcast(tot))
      .select(col("cell"), col("n_vecs"),
        round(col("n_vecs").cast("double") / col("total"), 6).as("share"),
        round(col("n_vecs").cast("double") * NumCentroids / col("total"), 6)
          .as("skew"),
        col("min_vec_id"), col("max_vec_id"))
      .orderBy("cell")
  }

  /** The prototypicality-scoring CTE `sc` over [[assignCteSql]]'s
    * tables — the SQL twin of [[prototypeScores]]. */
  private[operators] val protoScoreCteSql: String =
    """sc AS (SELECT cell, e0.vec_id,
      |    round(list_dot_product(v, cv) /
      |      (sqrt(list_dot_product(v, v)) * cnorm), 6) AS proto_cos
      |  FROM e0 JOIN assign USING (vec_id) JOIN cents USING (cell))""".stripMargin
}

/** Driver-contract registration for the similarity set.
  *
  * ANN oracle posture (round 7): the LSH hyperplanes and the seeded
  * IVF centroids are data-INDEPENDENT constants (seeded gaussians
  * compiled into the plan), so their oracles inline the very same
  * doubles as DuckDB list literals and replay the whole query —
  * bucket/cell assignment, candidate join, exact-cosine rerank — not
  * just the rerank tail. Double.toString round-trips to the identical
  * IEEE double through DuckDB's literal parser, and both engines sum
  * dot products left-to-right over the double-widened elements (the
  * bit-exactness q_knn_exact has hash-proven since round 4), so sign
  * bits and argmax cells agree bitwise. Only q_knn_ivf_fit's
  * quantizer is a data-FITTED model; its oracle is resolved by
  * Verify at dump time (dynamicOracles) with the fitted centroids
  * inlined — serving under the model is hash-checked, the fit itself
  * stays pinned by SimilaritySpec (a model fit is an artifact, not a
  * query). */
object SimilarityModule extends QueryModule {
  import Similarity._

  private def listLit(xs: Seq[Double]): String = xs.mkString("[", ", ", "]")

  /** Shared CTE: the norm-filtered double-cast vector base (embBase's
    * zero-norm exclusion). Shared with PqModule's oracles. */
  private[operators] val eCte =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |      WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
      |                             CAST(embedding AS DOUBLE[])) > 0)""".stripMargin

  /** Shared tail: exact-cosine rerank + per-query ranking over a
    * `cand(query_id, neighbor_id)` CTE — the SQL twin of rerankTopK.
    * Shared with PqModule's oracles. */
  private[operators] val rerankTail =
    """s AS (SELECT query_id, neighbor_id,
      |        list_dot_product(q.v, c.v) /
      |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
      |      FROM cand JOIN e q ON q.vec_id = cand.query_id
      |                JOIN e c ON c.vec_id = cand.neighbor_id)
      |SELECT query_id, neighbor_id, cos, rn FROM (
      |  SELECT query_id, neighbor_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
      |  FROM s)
      |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin

  /** The T×H hyperplanes as a VALUES table + the per-(vector, table)
    * bucket string: sign bit per plane, concatenated in plane order —
    * the SQL twin of bucketId. */
  private val lshBucketCtes: String = {
    val rows = (for {
      t <- 0 until NumTables; p <- 0 until NumPlanes
    } yield s"($t, $p, ${listLit(planes(t)(p))}::DOUBLE[])").mkString(",\n    ")
    s"""planes(table_idx, plane_idx, pl) AS (VALUES
       |    $rows),
       |b AS (SELECT vec_id, table_idx,
       |        string_agg(CASE WHEN list_dot_product(v, pl) >= 0 THEN '1' ELSE '0' END,
       |                   '' ORDER BY plane_idx) AS bucket
       |      FROM e CROSS JOIN planes GROUP BY vec_id, table_idx),
       |qb AS (SELECT vec_id AS query_id, table_idx, bucket FROM b WHERE vec_id < 10)""".stripMargin
  }

  private val lshOracleSql: String =
    s"""WITH $eCte,
       |$lshBucketCtes,
       |cand AS (SELECT DISTINCT query_id, cb.vec_id AS neighbor_id
       |         FROM qb JOIN b cb USING (table_idx, bucket)
       |         WHERE cb.vec_id <> qb.query_id),
       |$rerankTail""".stripMargin

  /** Static oracle for q_dedup_embedding_ann (Dedup.embeddingPairsAnn,
    * audit default: no threshold, top-20): the hyperplanes are
    * compile-time constants, so the WHOLE pipeline — sign-bit
    * bucketing, the MaxBandDf star-capped candidate join, exact-cosine
    * rerank, ranking — replays in SQL with no dump-time state at all
    * (the same plane literals that oracled the knn queries in round 7;
    * the star-cap replay follows the round-11 q_dedup_minhash shape).
    * Lives here because the plane/bucket CTEs are this module's;
    * DedupModule's oracle map references it. */
  private[operators] def embeddingAnnOracleSql(cap: Int): String =
    s"""WITH $eCte,
       |$lshBucketCtes,
       |st AS (
       |  SELECT vec_id AS id, table_idx, bucket,
       |    COUNT(*) OVER (PARTITION BY table_idx, bucket) AS df,
       |    MIN(vec_id) OVER (PARTITION BY table_idx, bucket) AS min_id
       |  FROM b),
       |allp AS (
       |  SELECT a.id AS id_a, c.id AS id_b
       |  FROM st a JOIN st c
       |    ON a.table_idx = c.table_idx AND a.bucket = c.bucket AND a.id < c.id
       |  WHERE a.df <= $cap),
       |star AS (
       |  SELECT min_id AS id_a, id AS id_b FROM st
       |  WHERE df > $cap AND id != min_id),
       |cand AS (SELECT DISTINCT id_a, id_b
       |         FROM (SELECT * FROM allp UNION ALL SELECT * FROM star)),
       |sc AS (
       |  SELECT id_a, id_b,
       |    list_dot_product(va.v, vb.v) /
       |      (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v))) AS cos
       |  FROM cand JOIN e va ON va.vec_id = cand.id_a
       |            JOIN e vb ON vb.vec_id = cand.id_b)
       |SELECT id_a, id_b, cos FROM sc
       |ORDER BY cos DESC, id_a ASC, id_b ASC LIMIT 20""".stripMargin

  // multi-probe: the query side additionally probes, per table, the
  // NumPlanes buckets at Hamming distance 1 (one sign bit flipped in
  // the bucket STRING — same derivation as the Spark side's flip())
  private val lshProbeOracleSql: String =
    s"""WITH $eCte,
       |$lshBucketCtes,
       |probes AS (
       |  SELECT query_id, table_idx, bucket FROM qb
       |  UNION
       |  SELECT query_id, table_idx,
       |    substr(bucket, 1, i - 1) ||
       |      (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END) ||
       |      substr(bucket, i + 1, $NumPlanes - i) AS bucket
       |  FROM qb, unnest(generate_series(1, $NumPlanes)) AS u(i)),
       |cand AS (SELECT DISTINCT query_id, cb.vec_id AS neighbor_id
       |         FROM probes JOIN b cb USING (table_idx, bucket)
       |         WHERE cb.vec_id <> probes.query_id),
       |$rerankTail""".stripMargin

  /** Hamming-radius-r multi-probe oracle: probes grow by chained
    * single-flip CTEs (p1 = flips of p0, p2 = flips of p1, …) whose
    * UNION dedupes the re-flips back to distance 0/…, so the probe set
    * is exactly Hamming ≤ r — the same candidate set the Spark side's
    * combination expansion produces (both dedupe through the DISTINCT
    * candidate join). radius 1 reproduces lshProbeOracleSql. */
  private[operators] def lshRadiusOracleSql(radius: Int): String = {
    val flipSql =
      s"""substr(bucket, 1, i - 1) ||
         |      (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END) ||
         |      substr(bucket, i + 1, $NumPlanes - i)""".stripMargin
    val levels = (1 to radius).map { r =>
      s"""p$r AS (
         |  SELECT query_id, table_idx,
         |    $flipSql AS bucket
         |  FROM p${r - 1}, unnest(generate_series(1, $NumPlanes)) AS u(i))""".stripMargin
    }
    val probesUnion = (0 to radius)
      .map(r => s"SELECT query_id, table_idx, bucket FROM p$r")
      .mkString("\n  UNION\n  ")
    s"""WITH $eCte,
       |$lshBucketCtes,
       |p0 AS (SELECT query_id, table_idx, bucket FROM qb),
       |${levels.mkString(",\n")},
       |probes AS (
       |  $probesUnion),
       |cand AS (SELECT DISTINCT query_id, cb.vec_id AS neighbor_id
       |         FROM probes JOIN b cb USING (table_idx, bucket)
       |         WHERE cb.vec_id <> probes.query_id),
       |$rerankTail""".stripMargin
  }

  /** IVF oracle over an arbitrary centroid table: corpus side assigns
    * each vector to its argmax-dot cell (FIRST max — lowest cell wins
    * ties, array_position semantics); the query side probes the top
    * NumProbe cells with the HIGHEST-cell tie order (reverse of an
    * ascending (dot, cell) sort — probedCells semantics). */
  private[operators] def ivfOracleSql(cents: Seq[Seq[Double]],
                                      nprobe: Int = SimilarityIvf.NumProbe): String = {
    val rows = cents.zipWithIndex
      .map { case (c, i) => s"(${i + 1}, ${listLit(c)}::DOUBLE[])" }
      .mkString(",\n    ")
    s"""WITH $eCte,
       |cents(cell, cv) AS (VALUES
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
       |cand AS (SELECT DISTINCT query_id, a.vec_id AS neighbor_id
       |         FROM qcells JOIN assign a USING (cell)
       |         WHERE a.vec_id <> qcells.query_id),
       |$rerankTail""".stripMargin
  }

  /** SQL twin of [[Similarity.annServeFixed]]: the fitted-IVF
    * online-serving head over the fixed query batch. Differences from
    * [[ivfOracleSql]] mirror the serve contract exactly — qcells over
    * vec_id ∈ [ServeLo, ServeHi), NO self-exclusion (serve traffic is
    * external by contract; the corpus replay finding itself at cos 1
    * is the determinism anchor), and the presentation cosine rounded
    * to 6 (serveRerank's output contract; ranking still uses the raw
    * double, same as the Spark window). */
  private def serveIvfOracleSql(cents: Seq[Seq[Double]], nprobe: Int): String = {
    val rows = cents.zipWithIndex
      .map { case (c, i) => s"(${i + 1}, ${listLit(c)}::DOUBLE[])" }
      .mkString(",\n    ")
    s"""WITH $eCte,
       |cents(cell, cv) AS (VALUES
       |    $rows),
       |d AS (SELECT vec_id, cell, list_dot_product(v, cv) AS dt FROM e CROSS JOIN cents),
       |assign AS (SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dt DESC, cell ASC) AS rn
       |    FROM d) WHERE rn = 1),
       |qcells AS (SELECT vec_id AS query_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dt DESC, cell DESC) AS rn
       |    FROM d WHERE vec_id >= ${Similarity.ServeLo} AND vec_id < ${Similarity.ServeHi})
       |  WHERE rn <= $nprobe),
       |cand AS (SELECT DISTINCT query_id, a.vec_id AS neighbor_id
       |         FROM qcells JOIN assign a USING (cell)),
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
  }

  /** SQL twin of [[Similarity.annServeFixedLsh]]: the LSH online-
    * serving head over the fixed query batch. The plane table carries
    * the ARTIFACT's plane count `h` (corpus-sized at index build —
    * [[Similarity.planesFor]] literals, not the compile-time
    * NumPlanes set), probes expand by chained single-flips to the
    * TUNED Hamming radius (the lshRadiusOracleSql recipe generalized
    * to h planes), and the serve contract mirrors serveIvfOracleSql —
    * qb over [ServeLo, ServeHi), NO self-exclusion, presentation
    * cosine rounded to 6. */
  private def serveLshOracleSql(h: Int, radius: Int): String = {
    val rows = (for { t <- 0 until NumTables; p <- 0 until h }
      yield s"($t, $p, ${listLit(Similarity.planesFor(t, h)(p))}::DOUBLE[])")
      .mkString(",\n    ")
    val flipSql =
      s"""substr(bucket, 1, i - 1) ||
         |      (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END) ||
         |      substr(bucket, i + 1, $h - i)""".stripMargin
    val levels = (1 to radius).map { r =>
      s"""p$r AS (
         |  SELECT query_id, table_idx,
         |    $flipSql AS bucket
         |  FROM p${r - 1}, unnest(generate_series(1, $h)) AS u(i))""".stripMargin
    }
    val probesUnion = (0 to radius)
      .map(r => s"SELECT query_id, table_idx, bucket FROM p$r")
      .mkString("\n  UNION\n  ")
    s"""WITH $eCte,
       |planes(table_idx, plane_idx, pl) AS (VALUES
       |    $rows),
       |b AS (SELECT vec_id, table_idx,
       |        string_agg(CASE WHEN list_dot_product(v, pl) >= 0 THEN '1' ELSE '0' END,
       |                   '' ORDER BY plane_idx) AS bucket
       |      FROM e CROSS JOIN planes GROUP BY vec_id, table_idx),
       |p0 AS (SELECT vec_id AS query_id, table_idx, bucket FROM b
       |       WHERE vec_id >= ${Similarity.ServeLo} AND vec_id < ${Similarity.ServeHi}),
       |${levels.mkString(",\n")},
       |probes AS (
       |  $probesUnion),
       |cand AS (SELECT DISTINCT query_id, cb.vec_id AS neighbor_id
       |         FROM probes JOIN b cb USING (table_idx, bucket)),
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
  }

  /** [[ivfOracleSql]] with the candidate-stage label predicate — the
    * SQL twin of SimilarityIvf.annIvfFiltered (pre-filter semantics:
    * the label join constrains candidates BEFORE the rerank). */
  private[operators] def ivfFilteredOracleSql(cents: Seq[Seq[Double]],
                                              nprobe: Int,
                                              labelMax: Int): String = {
    val rows = cents.zipWithIndex
      .map { case (c, i) => s"(${i + 1}, ${listLit(c)}::DOUBLE[])" }
      .mkString(",\n    ")
    s"""WITH $eCte,
       |cents(cell, cv) AS (VALUES
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
       |lab AS (SELECT vec_id FROM embeddings WHERE label < $labelMax),
       |cand AS (SELECT DISTINCT query_id, a.vec_id AS neighbor_id
       |         FROM qcells JOIN assign a USING (cell)
       |                     JOIN lab ON lab.vec_id = a.vec_id
       |         WHERE a.vec_id <> qcells.query_id),
       |$rerankTail""".stripMargin
  }

  // the zero-norm exclusion mirrors the Spark side's `nrm > 0` filter
  // (no cosine exists for a zero vector) — without it the first zero
  // embedding in a corpus would break the hash compare on rows only
  // one engine emits
  private val knnOracleSql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |           WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])) > 0),
      |q AS (SELECT * FROM e WHERE vec_id < 10),
      |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        list_dot_product(q.v, c.v) /
      |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
      |      FROM q JOIN e c ON c.vec_id != q.vec_id)
      |SELECT query_id, neighbor_id, cos, rn FROM (
      |  SELECT query_id, neighbor_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
      |  FROM s)
      |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin

  /** SQL twin of prototypePrune: seeded-centroid literals (with their
    * driver-computed norms inlined as the same doubles the Spark plan
    * multiplies by), the semanticDedup assignment CTE, then the
    * per-cell rank/count window over the rounded cosine. */
  private val protoOracleSql: String =
    s"""WITH ${SimilarityIvf.assignCteSql},
       |${SimilarityIvf.protoScoreCteSql},
       |r AS (SELECT cell, vec_id, proto_cos,
       |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY proto_cos DESC, vec_id ASC) AS cell_rank,
       |    COUNT(*) OVER (PARTITION BY cell) AS cell_n
       |  FROM sc)
       |SELECT cell, vec_id, proto_cos, cell_rank, cell_n
       |FROM r WHERE cell_rank <= CAST(floor(${SimilarityIvf.PrototypeFrac} * cell_n) AS BIGINT)
       |ORDER BY cell, cell_rank""".stripMargin

  def queries = Map(
    "q_knn_exact" -> ((s: SparkSession, d: String) => knnExact(s, d)),
    "q_knn_mmr" -> ((s: SparkSession, d: String) => mmrRerank(s, d)),
    "q_knn_exact_agg" -> ((s: SparkSession, d: String) => knnExactAgg(s, d)),
    "q_knn_lsh" -> ((s: SparkSession, d: String) => annLsh(s, d)),
    "q_knn_lsh_probe" -> ((s: SparkSession, d: String) => annLshMultiProbe(s, d)),
    "q_knn_lsh_tuned" -> ((s: SparkSession, d: String) => annLshTuned(s, d)),
    "q_ann_recall_families" -> ((s: SparkSession, d: String) => annRecallByFamily(s, d)),
    "q_knn_ivf" -> ((s: SparkSession, d: String) => SimilarityIvf.annIvf(s, d)),
    "q_knn_ivf_fit" -> ((s: SparkSession, d: String) => SimilarityIvf.annIvfFitted(s, d)),
    "q_ann_serve_ivf" -> ((s: SparkSession, d: String) => annServeFixed(s, d)),
    "q_ann_serve_lsh" -> ((s: SparkSession, d: String) => annServeFixedLsh(s, d)),
    "q_knn_ivf_tuned" -> ((s: SparkSession, d: String) => SimilarityIvf.annIvfTuned(s, d)),
    "q_knn_ivf_filtered" -> ((s: SparkSession, d: String) => SimilarityIvf.annIvfFiltered(s, d)),
    "q_label_centroids" -> ((s: SparkSession, d: String) => labelCentroids(s, d)),
    "q_embedding_outliers" -> ((s: SparkSession, d: String) => embeddingOutliers(s, d)),
    "q_quantize_embeddings" -> ((s: SparkSession, d: String) => quantizeEmbeddings(s, d)),
    "q_prune_prototypes" -> ((s: SparkSession, d: String) => SimilarityIvf.prototypePrune(s, d)),
    "q_ivf_stats" -> ((s: SparkSession, d: String) => SimilarityIvf.ivfStats(s, d)),
    "q_index_geometry" -> ((s: SparkSession, d: String) => Reindex.geometryDrift(s, d)),
    "q_ann_recall" -> ((s: SparkSession, d: String) => SimilarityIvf.annRecallReport(s, d)),
    "q_hybrid_search" -> ((s: SparkSession, d: String) => hybridRrf(s, d)),
    "q_knn_sq8" -> ((s: SparkSession, d: String) => knnSq8(s, d)),
    "q_knn_ivf_sq8" -> ((s: SparkSession, d: String) => knnIvfSq8(s, d)),
    "q_hard_negatives" -> ((s: SparkSession, d: String) => EmbeddingOps.hardNegatives(s, d)),
    "q_hard_negatives_ann" -> ((s: SparkSession, d: String) => EmbeddingOps.hardNegativesAnn(s, d)),
    "q_embedding_drift" -> ((s: SparkSession, d: String) => EmbeddingOps.embeddingDrift(s, d)),
    "q_stream_parity_drift" -> ((s: SparkSession, d: String) => EmbeddingOps.streamParityDrift(s, d)),
    "q_training_triplets" -> ((s: SparkSession, d: String) => EmbeddingOps.trainingTriplets(s, d)),
    "q_training_triplets_ann" -> ((s: SparkSession, d: String) => EmbeddingOps.trainingTripletsAnn(s, d)),
    "q_feature_drift" -> ((s: SparkSession, d: String) => EmbeddingOps.featureDrift(s, d)))

  // q_knn_exact_agg shares q_knn_exact's oracle: same semantics, the
  // Aggregator formulation just changes the physical plan.
  /** RRF hybrid oracle: the shared pair-table CTE chain (lexical leg)
    * + the exact-cosine ranking (dense leg, vector CTE renamed `ev` to
    * avoid the pair chain's `e`), fused with the same two coalesced
    * 1/(60+r) terms. */
  private val hybridOracleSql: String =
    s"""WITH ${DedupModule.PairTableCteSql},
       |lex AS (SELECT id_a AS query_id, id_b AS neighbor_id, jaccard FROM pj WHERE id_a < 10
       |        UNION ALL
       |        SELECT id_b, id_a, jaccard FROM pj WHERE id_b < 10),
       |lexr AS (SELECT query_id, neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY query_id
       |                              ORDER BY jaccard DESC, neighbor_id ASC) AS r_lex
       |         FROM lex),
       |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |       WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
       |                              CAST(embedding AS DOUBLE[])) > 0),
       |dns AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |          list_dot_product(q.v, c.v) /
       |            (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
       |        FROM ev q JOIN ev c ON c.vec_id <> q.vec_id WHERE q.vec_id < 10),
       |dnsr AS (SELECT query_id, neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY query_id
       |                              ORDER BY cos DESC, neighbor_id ASC) AS r_dense
       |         FROM dns),
       |f AS (SELECT COALESCE(lexr.query_id, dnsr.query_id) AS query_id,
       |        COALESCE(lexr.neighbor_id, dnsr.neighbor_id) AS neighbor_id,
       |        round(COALESCE(CAST(1 AS DOUBLE) / (60 + r_lex), 0) +
       |              COALESCE(CAST(1 AS DOUBLE) / (60 + r_dense), 0), 6) AS rrf
       |      FROM lexr FULL OUTER JOIN dnsr
       |        ON lexr.query_id = dnsr.query_id AND lexr.neighbor_id = dnsr.neighbor_id)
       |SELECT query_id, neighbor_id, rrf, rn FROM (
       |  SELECT query_id, neighbor_id, rrf,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY rrf DESC, neighbor_id ASC) AS rn
       |  FROM f)
       |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin

  private val sq8OracleSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, list_max(list_transform(v, y -> abs(y))) AS scale, v FROM e),
      |qt AS (SELECT vec_id, list_transform(v, y ->
      |         CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
      |              ELSE floor(y * 127 / scale + 0.5) END) AS qd
      |       FROM s),
      |n AS (SELECT vec_id, qd, list_dot_product(qd, qd) AS nrm2 FROM qt
      |      WHERE list_dot_product(qd, qd) > 0),
      |d AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        list_dot_product(q.qd, c.qd) / (sqrt(q.nrm2) * sqrt(c.nrm2)) AS cos
      |      FROM n q JOIN n c ON c.vec_id <> q.vec_id WHERE q.vec_id < 10)
      |SELECT query_id, neighbor_id, round(cos, 6) AS cos_q, rn FROM (
      |  SELECT query_id, neighbor_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY cos DESC, neighbor_id ASC) AS rn
      |  FROM d)
      |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin

  /** SQL twin of [[Similarity.knnIvfSq8]]: the fitted-IVF candidate
    * CTEs (PqModule's, under the dump-time-resolved centroid literals
    * and tuned nprobe) feeding the int8 scoring chain, which is
    * renamed (ss/sqt/sn/sd) because ivfCtes already owns `d`. Scoring
    * arithmetic is byte-identical to sq8OracleSql — only WHICH pairs
    * are scored changes. */
  private def ivfSq8OracleSql(cents: Seq[Seq[Double]], nprobe: Int): String =
    s"""WITH $eCte,
       |${PqModule.ivfCtes(cents, nprobe)},
       |ss AS (SELECT vec_id, list_max(list_transform(v, y -> abs(y))) AS scale, v FROM e),
       |sqt AS (SELECT vec_id, list_transform(v, y ->
       |          CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
       |               ELSE floor(y * 127 / scale + 0.5) END) AS qd
       |        FROM ss),
       |sn AS (SELECT vec_id, qd, list_dot_product(qd, qd) AS nrm2 FROM sqt
       |       WHERE list_dot_product(qd, qd) > 0),
       |sd AS (SELECT cand.query_id, cand.neighbor_id,
       |         list_dot_product(q.qd, c.qd) / (sqrt(q.nrm2) * sqrt(c.nrm2)) AS cos
       |       FROM cand JOIN sn q ON q.vec_id = cand.query_id
       |                 JOIN sn c ON c.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id, round(cos, 6) AS cos_q, rn FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id ASC) AS rn
       |  FROM sd)
       |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin

  /** SQL twin of [[Similarity.mmrRerank]]: the k greedy selection
    * rounds UNROLL as CTEs (k is a serving constant), each one the
    * same argmax-with-penalty the Spark side computes — identical
    * arithmetic, identical tie order, so picks and scores hash-match.
    * Generated, not longhand, like the superstep oracles. */
  private def mmrOracleSql: String = {
    val lam = "CAST(0.7 AS DOUBLE)"
    val pen = "CAST(0.3 AS DOUBLE)"
    val k = Similarity.TopKDefault
    val rounds = (2 to k).map { i =>
      val prevSel = (1 until i).map(j => s"SELECT query_id, neighbor_id FROM sel$j")
        .mkString(" UNION ALL ")
      s"""sel$i AS (SELECT query_id, neighbor_id, $i AS pick_order, score FROM (
         |  SELECT p.query_id, p.neighbor_id,
         |    $lam * p.cos - $pen * coalesce(mx.max_cc, 0) AS score,
         |    ROW_NUMBER() OVER (PARTITION BY p.query_id
         |      ORDER BY $lam * p.cos - $pen * coalesce(mx.max_cc, 0) DESC,
         |               p.neighbor_id ASC) AS rk
         |  FROM pool p
         |  LEFT JOIN (SELECT pc.query_id, pc.neighbor_id, MAX(pc.sim_cc) AS max_cc
         |             FROM pc JOIN ($prevSel) s
         |               ON s.query_id = pc.query_id AND s.neighbor_id = pc.other_id
         |             GROUP BY pc.query_id, pc.neighbor_id) mx
         |    ON mx.query_id = p.query_id AND mx.neighbor_id = p.neighbor_id
         |  WHERE NOT EXISTS (SELECT 1 FROM ($prevSel) s2
         |    WHERE s2.query_id = p.query_id AND s2.neighbor_id = p.neighbor_id)
         |  ) WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $eCte,
       |q AS (SELECT * FROM e WHERE vec_id < ${Similarity.NumQueriesDefault}),
       |s0 AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.v, c.v) /
       |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
       |  FROM q JOIN e c ON c.vec_id <> q.vec_id),
       |pool AS (SELECT query_id, neighbor_id, cos FROM (
       |    SELECT query_id, neighbor_id, cos,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
       |    FROM s0) WHERE rn <= ${Similarity.MmrPoolN}),
       |pc AS (SELECT a.query_id, a.neighbor_id, b.neighbor_id AS other_id,
       |    list_dot_product(ea.v, eb.v) /
       |      (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS sim_cc
       |  FROM pool a JOIN pool b ON b.query_id = a.query_id AND b.neighbor_id <> a.neighbor_id
       |  JOIN e ea ON ea.vec_id = a.neighbor_id
       |  JOIN e eb ON eb.vec_id = b.neighbor_id),
       |sel1 AS (SELECT query_id, neighbor_id, 1 AS pick_order, score FROM (
       |    SELECT query_id, neighbor_id, $lam * cos AS score,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY $lam * cos DESC, neighbor_id ASC) AS rk
       |    FROM pool) WHERE rk = 1),
       |$rounds
       |SELECT query_id, pick_order, neighbor_id, round(score, 6) AS mmr_score
       |FROM (${(1 to k).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")})
       |ORDER BY query_id, pick_order""".stripMargin
  }

  def oracles = Map(
    "q_hard_negatives" -> EmbeddingOps.hardNegOracleSql,
    "q_training_triplets" -> EmbeddingOps.tripletOracleSql,
    "q_feature_drift" -> EmbeddingOps.featureDriftOracleSql,
    "q_hybrid_search" -> hybridOracleSql,
    "q_knn_sq8" -> sq8OracleSql,
    "q_knn_exact_agg" -> knnOracleSql,
    "q_knn_mmr" -> mmrOracleSql,
    "q_knn_exact" -> knnOracleSql,
    "q_knn_lsh" -> lshOracleSql,
    "q_knn_lsh_probe" -> lshProbeOracleSql,
    "q_knn_ivf" -> ivfOracleSql(SimilarityIvf.centroids),
    "q_prune_prototypes" -> protoOracleSql,
    "q_ivf_stats" ->
      s"""WITH ${SimilarityIvf.assignCteSql},
         |g AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |    CAST(MIN(vec_id) AS BIGINT) AS min_vec_id,
         |    CAST(MAX(vec_id) AS BIGINT) AS max_vec_id
         |  FROM assign GROUP BY cell),
         |t AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS total FROM g)
         |SELECT cell, n_vecs,
         |  round(CAST(n_vecs AS DOUBLE) / total, 6) AS share,
         |  round(CAST(n_vecs AS DOUBLE) * ${SimilarityIvf.NumCentroids} / total, 6) AS skew,
         |  min_vec_id, max_vec_id
         |FROM g CROSS JOIN t ORDER BY cell""".stripMargin,
    "q_quantize_embeddings" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT vec_id,
        |    list_max(list_transform(v, y -> abs(y))) AS scale,
        |    unnest(v) AS val
        |  FROM e),
        |qq AS (SELECT vec_id,
        |    CASE WHEN scale = 0 THEN 0
        |         ELSE CAST(floor(val * 127 / scale + 0.5) AS BIGINT) END AS q
        |  FROM x)
        |SELECT vec_id,
        |  CAST(MIN(q) AS BIGINT) AS qmin, CAST(MAX(q) AS BIGINT) AS qmax,
        |  CAST(SUM(q) AS BIGINT) AS qsum,
        |  CAST(SUM(CASE WHEN abs(q) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_sat
        |FROM qq GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "q_label_centroids" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT label, i - 1 AS pos, CAST(v[i] AS DECIMAL(27,9)) AS val
        |      FROM e, unnest(generate_series(1, len(v))) AS u(i))
        |SELECT label, pos, round(CAST(SUM(val) AS DOUBLE) / COUNT(*), 6) AS centroid
        |FROM x GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "q_embedding_outliers" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT label, i - 1 AS pos, CAST(v[i] AS DECIMAL(27,9)) AS val
        |      FROM e, unnest(generate_series(1, len(v))) AS u(i)),
        |cent AS (SELECT label, pos, round(CAST(SUM(val) AS DOUBLE) / COUNT(*), 6) AS c
        |         FROM x GROUP BY label, pos),
        |nc AS (SELECT label, SUM(CAST(c * c AS DECIMAL(27,15))) AS nc
        |       FROM cent GROUP BY label),
        |ev AS (SELECT vec_id, label, i - 1 AS pos, v[i] AS val
        |       FROM e, unnest(generate_series(1, len(v))) AS u(i)),
        |agg AS (SELECT vec_id, ev.label,
        |    SUM(CAST(ev.val * cent.c AS DECIMAL(27,15))) AS dotc,
        |    SUM(CAST(ev.val * ev.val AS DECIMAL(27,15))) AS nv
        |  FROM ev JOIN cent ON ev.label = cent.label AND ev.pos = cent.pos
        |  GROUP BY vec_id, ev.label
        |  HAVING SUM(CAST(ev.val * ev.val AS DECIMAL(27,15))) > 0),
        |sc AS (SELECT a.label, vec_id,
        |    round(CAST(dotc AS DOUBLE) /
        |      (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(nc.nc AS DOUBLE))), 6) AS cos_centroid
        |  FROM agg a JOIN nc ON a.label = nc.label)
        |SELECT label, vec_id, cos_centroid, rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY label ORDER BY cos_centroid ASC, vec_id ASC) AS rn
        |  FROM sc)
        |WHERE rn <= 5 ORDER BY label, rn""".stripMargin)

  /** SQL twin of [[Reindex.geometryDrift]]: the three index families'
    * occupancy aggregates — LSH over the plane-literal bucket CTE
    * (built h read off the bucket strings, exactly as the Spark side
    * does), seeded IVF, and the fitted IVF under dump-time-resolved
    * centroid literals — each compared against the sizing formula the
    * current corpus would get (hForCount / corpusK replayed in SQL). */
  private def geometryOracleSql(cents: Seq[Seq[Double]]): String = {
    def assignCtes(cs: Seq[Seq[Double]], p: String): String = {
      val rows = cs.zipWithIndex
        .map { case (c, i) => s"(${i + 1}, ${listLit(c)}::DOUBLE[])" }
        .mkString(",\n    ")
      s"""${p}cents(cell, cv) AS (VALUES
         |    $rows),
         |${p}d AS (SELECT vec_id, cell, list_dot_product(v, cv) AS dt
         |          FROM e CROSS JOIN ${p}cents),
         |${p}assign AS (SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dt DESC, cell ASC) AS rn
         |    FROM ${p}d) WHERE rn = 1),
         |${p}occ AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS c
         |            FROM ${p}assign GROUP BY cell),
         |${p}agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |                   CAST(SUM(c) AS BIGINT) AS total,
         |                   CAST(MAX(c) AS BIGINT) AS max_occ FROM ${p}occ
         |            HAVING COUNT(*) > 0)""".stripMargin
    }
    val tables = Similarity.NumTables
    val occT = Similarity.TargetBucketOccupancy
    // integer bit-length target (length of the binary string), the
    // exact twin of hForCount — a float log2 could flap at an exact
    // power-of-two boundary
    val hCells = s"GREATEST(1, (total // $tables + ${occT - 1}) // $occT)"
    val hTarget = s"GREATEST(${Similarity.NumPlanes}, LEAST(${Similarity.MaxPlanes}, " +
      s"CAST(CASE WHEN $hCells <= 1 THEN 0 ELSE length(bin($hCells - 1)) END AS INT)))"
    val kTarget = "GREATEST(16, LEAST(4096, CAST(ceil(sqrt(CAST(n AS DOUBLE))) * 4 AS INT)))"
    val skew = "round(CAST(max_occ AS DOUBLE) * n_buckets / total, 6)"
    s"""WITH $eCte,
       |$lshBucketCtes,
       |locc AS (SELECT table_idx, bucket, CAST(COUNT(*) AS BIGINT) AS c
       |         FROM b GROUP BY table_idx, bucket),
       |lagg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |                CAST(SUM(c) AS BIGINT) AS total,
       |                CAST(MAX(c) AS BIGINT) AS max_occ,
       |                CAST(MIN(length(bucket)) AS INT) AS built_h
       |         FROM locc HAVING COUNT(*) > 0),
       |${assignCtes(SimilarityIvf.centroids, "s")},
       |${assignCtes(cents, "f")},
       |nraw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)
       |SELECT family, built_param, target_param, n_vecs, n_buckets,
       |       mean_occ, max_occ, skew, rebuild FROM (
       |  SELECT 'lsh' AS family, built_h AS built_param,
       |    CAST($hTarget AS INT) AS target_param,
       |    total // $tables AS n_vecs, n_buckets,
       |    round(CAST(total AS DOUBLE) / n_buckets, 6) AS mean_occ, max_occ,
       |    $skew AS skew,
       |    built_h <> $hTarget AS rebuild
       |  FROM lagg
       |  UNION ALL
       |  SELECT 'ivf', CAST(${SimilarityIvf.NumCentroids} AS INT),
       |    CAST(${SimilarityIvf.NumCentroids} AS INT), total, n_buckets,
       |    round(CAST(total AS DOUBLE) / n_buckets, 6), max_occ, $skew,
       |    $skew > ${Reindex.IvfSkewMax}
       |  FROM sagg
       |  UNION ALL
       |  SELECT 'ivf_fit', CAST(${cents.length} AS INT),
       |    CAST($kTarget AS INT), total, n_buckets,
       |    round(CAST(total AS DOUBLE) / n_buckets, 6), max_occ, $skew,
       |    ${cents.length} <> $kTarget OR $skew > ${Reindex.IvfSkewMax}
       |  FROM fagg CROSS JOIN nraw)
       |ORDER BY family""".stripMargin
  }

  /** q_knn_ivf_fit's oracle needs the centroids k-means FITTED on this
    * corpus — resolved when Verify dumps oracle_sql.json. fitCentroids
    * is deterministic (hash-ordered sample, fixed seeds/iterations)
    * and cached per (session, dir), so the literals match the cells
    * the query assigned in the same session bit-for-bit. */
  override def dynamicOracles(spark: SparkSession, dir: String): Map[String, String] = {
    val cents = SimilarityIvf.fitCentroids(spark, dir)
    val nprobe = SimilarityIvf.probeFor(cents.length)
    Map(
      "q_knn_ivf_fit" -> ivfOracleSql(cents, nprobe),
      // the drift monitor's fitted-family leg resolves its centroid
      // literals (and built-k) exactly like the fitted-IVF serving legs
      "q_index_geometry" -> geometryOracleSql(cents),
      // exclusion-filtered mining + the PSI drift report resolve their
      // fitted centroids (and the exclusion probe budget) exactly like
      // the fitted-IVF legs
      "q_hard_negatives_ann" -> EmbeddingOps.hardNegAnnOracleSql(cents,
        EmbeddingOps.probeForExclusion(spark, dir, cents.length)),
      "q_training_triplets_ann" -> EmbeddingOps.tripletAnnOracleSql(cents,
        EmbeddingOps.probeForInclusion(spark, dir, cents.length),
        EmbeddingOps.probeForExclusion(spark, dir, cents.length)),
      "q_embedding_drift" -> EmbeddingOps.driftOracleSql(cents),
      // the drift-gate parity head shares the same fitted-centroid
      // literals; its reduction is the BIGINT checksum discipline
      "q_stream_parity_drift" -> EmbeddingOps.streamParityDriftOracleSql(cents),
      // the tuned budget resolves at dump time exactly like the
      // centroids: the memoized tuner has already run (or runs now)
      // on the same session, so the literal nprobe matches serving
      "q_knn_ivf_tuned" -> ivfOracleSql(cents,
        SimilarityIvf.tunedProbe(spark, dir)),
      // the online-serving head: fitted centroids + the PERSISTED
      // tuned probe budget, no self-exclusion, rounded presentation
      // cosine — the serve path end to end
      "q_ann_serve_ivf" -> serveIvfOracleSql(cents,
        SimilarityIvf.tunedProbe(spark, dir)),
      // the LSH serving head resolves the artifact's frozen plane
      // count and the tuned probe radius the same dump-time way
      "q_ann_serve_lsh" -> serveLshOracleSql(
        Similarity.corpusH(spark, dir),
        Similarity.tunedLshRadius(spark, dir)),
      // both legs nested verbatim: exact top-k vs the fitted-IVF
      // shortlist under the SAME resolved centroid literals
      "q_ann_recall" ->
        s"""WITH ex AS (SELECT query_id, neighbor_id FROM (
           |${knnOracleSql}
           |)),
           |ap AS (SELECT query_id, neighbor_id FROM (
           |${ivfOracleSql(cents, nprobe)}
           |))
           |SELECT ex.query_id, CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hits,
           |  round(CAST(COUNT(ap.neighbor_id) AS DOUBLE)
           |    / ${Similarity.TopKDefault}, 6) AS recall_at_k
           |FROM ex LEFT JOIN ap ON ap.query_id = ex.query_id
           |  AND ap.neighbor_id = ex.neighbor_id
           |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin,
      // IVF-pruned int8 serving: the same resolved centroid + tuned
      // nprobe literals as the ivf_tuned leg, int8 arithmetic as sq8
      "q_knn_ivf_sq8" -> ivfSq8OracleSql(cents,
        SimilarityIvf.tunedProbe(spark, dir)),
      "q_knn_ivf_filtered" -> ivfFilteredOracleSql(cents,
        SimilarityIvf.probeForFiltered(spark, dir, cents.length,
          SimilarityIvf.FilterLabelMax),
        SimilarityIvf.FilterLabelMax),
      // the tuned LSH radius resolves at dump time like the tuned
      // nprobe — the probe expansion replays in SQL at that radius
      "q_knn_lsh_tuned" -> lshRadiusOracleSql(
        Similarity.tunedLshRadius(spark, dir)),
      // every family's serving SQL nested verbatim against the exact
      // top-k — recall is hash-checked per family end to end
      "q_ann_recall_families" -> {
        val cbs = SimilarityPq.fitCodebooks(spark, dir)
        val legs = Seq(
          "ivf_fit" -> ivfOracleSql(cents, nprobe),
          "ivf_tuned" -> ivfOracleSql(cents,
            SimilarityIvf.tunedProbe(spark, dir)),
          "lsh" -> lshOracleSql,
          "lsh_probe" -> lshProbeOracleSql,
          "lsh_tuned" -> lshRadiusOracleSql(
            Similarity.tunedLshRadius(spark, dir)),
          "pq" -> PqModule.pqOracleSql(cbs),
          "pq_rerank" -> PqModule.pqRerankOracleSql(cbs),
          "pq_rerank_tuned" -> PqModule.pqRerankOracleSql(cbs,
            SimilarityPq.tunedRerankCands(spark, dir)),
          "ivfpq" -> PqModule.pqIvfOracleSql(cbs, cents,
            SimilarityIvf.probeFor(cents.length)),
          "ivfpq_refined" -> PqModule.pqIvfRefinedOracleSql(cbs, cents,
            SimilarityIvf.tunedProbe(spark, dir),
            SimilarityPq.tunedRerankCands(spark, dir)),
          "sq8" -> sq8OracleSql,
          "ivf_sq8" -> ivfSq8OracleSql(cents,
            SimilarityIvf.tunedProbe(spark, dir)))
        legs.map { case (name, sql) =>
          val baselineOf = Similarity.recallBaselineOf.get(name)
            .map(t => s"'$t'").getOrElse("CAST(NULL AS VARCHAR)")
          s"""SELECT '$name' AS family, CAST(COUNT(*) AS BIGINT) AS n_exact,
             |  CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hits,
             |  round(CAST(COUNT(ap.neighbor_id) AS DOUBLE) / COUNT(*), 6) AS recall,
             |  $baselineOf AS baseline_of
             |FROM (
             |$knnOracleSql
             |) ex LEFT JOIN (
             |$sql
             |) ap ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY family")
      })
  }
}
