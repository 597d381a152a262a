package graft

import org.apache.spark.sql.DataFrame

/** Executable version of PLANS.md: pins the physical-plan properties
  * the engine is designed around, so a regression (lost pushdown, a
  * resurrected forced broadcast, a second shuffle before a window)
  * fails CI instead of only showing up in a bench diff at scale. */
class PlanSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  test("filters and projection reach the parquet scans") {
    val p = plan(q("q_pricing_summary"))
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("ReadSchema: struct<l_quantity:double"), p)
    assert(!p.contains("l_comment"), "projection must prune unused lineitem columns")
    val w = plan(q("q_catalog_worklist"))
    assert(w.contains("StringContains(c_mktsegment,BUILD"), w)
  }

  test("aggregation is partial+final (map-side combine before the shuffle)") {
    val p = plan(q("q_pricing_summary"))
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 2, s"expected partial+final HashAggregate, got $aggs in:\n$p")
  }

  test("top-k plans as TakeOrderedAndProject, never a global sort") {
    val p = plan(q("q_topk_orders"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("+- Sort "), s"global sort would buffer the full dataset:\n$p")
  }

  test("feature queries never read the media payload column") {
    Seq("q_media_features", "q_media_audio", "q_media_video").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("payload:binary"),
        s"$name: payload bytes must be pruned out of feature scans:\n$p")
    }
  }

  test("media header kernels run in the scan stage: one exchange (the output ordering) only") {
    // wav_info / mp4_info / image_dims must evaluate in the narrow
    // projection over the scan — a second exchange would mean payload
    // bytes (or their derivations) moved between stages
    Seq("q_media_audio", "q_media_video").foreach { name =>
      val p = q(name).queryExecution.executedPlan.toString
      val exchanges = "Exchange ".r.findAllIn(p).length
      assert(exchanges == 1,
        s"$name: expected exactly the ordering exchange, found $exchanges:\n${p.take(2000)}")
    }
  }

  test("windows cost exactly one shuffle each") {
    for (name <- Seq("q_window_running", "q_window_range")) {
      val p = plan(q(name))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 1, s"$name: expected 1 hash exchange, got $exchanges:\n$p")
    }
  }

  test("no forced broadcast on O(corpus) signature tables (stats/AQE decide)") {
    for (name <- Seq("q_dedup_minhash", "q_dedup_simhash")) {
      val o = optimized(q(name))
      assert(!o.contains("ResolvedHint") && !o.contains("UnresolvedHint"),
        s"$name must not hint-force a broadcast:\n${o.take(2000)}")
    }
  }

  test("dimension joins broadcast under the hint; bucketed layout needs no exchange") {
    val p = plan(q("q_revenue_by_region"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("no cartesian product anywhere in the query surface") {
    // The only crossJoins in the engine are 1-row scalar broadcasts
    // (TF-IDF's N, PPS's total, corpusMix's N*), which plan as
    // BroadcastNestedLoopJoin — a CartesianProductExec anywhere means
    // a join lost its keys and would be a corpus², not a plan detail.
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n${p.take(2000)}")
    }
  }

  test("unpartitioned windows appear only over block-total prefix tables") {
    import org.apache.spark.sql.execution.window.WindowExec
    def unpartitioned(name: String): Int =
      SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.size
    // the distributed prefix-sum family: exactly ONE unpartitioned
    // window each, and it consumes block TOTALS (≤ a few thousand
    // rows), never document rows — q_zorder_layout joined the family
    // in r18 (its file assignment was the engine's last full-table
    // single-reducer window: NTILE over the whole orders table)
    for (name <- Seq("q_token_budget", "q_pps_sample", "q_pack_chunks",
        "q_zorder_layout"))
      assert(unpartitioned(name) == 1, s"$name block-prefix window count")
    // the drift-gate parity head reduces a psiReport, whose share/PSI
    // totals are one global window over the K-cell occupancy table
    // (≤ a few thousand rows — the same bounded-totals class; its
    // partitionBy(lit(1)) constant-folds to an empty partition spec)
    assert(unpartitioned("q_stream_parity_drift") == 1,
      "q_stream_parity_drift cell-total window count")
    // the layout-quality audit runs the same physics TWICE (one
    // blockCumsum per layout leg) — exactly two block-total windows
    assert(unpartitioned("q_zorder_quality") == 2,
      "q_zorder_quality block-prefix window count")
    // per-lang/per-doc rank assembly must stay fully partitioned —
    // including the embedding label-block cap's row_number, which
    // partitions by label (a global-sort cap would serialize the corpus
    // through one partition)
    for (name <- Seq("q_corpus_mix", "q_dup_spans", "q_dup_spans_keep",
        "q_dedup_canonical", "q_embedding_outliers", "q_dedup_embedding",
        "q_ann_serve_ivfpq", "q_ann_serve_lsh", "q_stream_parity_batch",
        "q_stream_parity_quality"))
      assert(unpartitioned(name) == 0, s"$name has an unpartitioned window")
  }

  test("AQE splits a planted skewed sort-merge join (OptimizeSkewedJoin fires)") {
    // The engine's answer to join skew a salting rewrite can't reach:
    // AQE detects the fat post-shuffle partition at runtime and splits
    // it. Plant a 0.35 M-row hot key (~88 % of the big side) against a
    // small-but-unbroadcastable dimension, with thresholds scaled to
    // the test corpus, and pin that the executed plan actually marks
    // the join skew=true — the knob regressing to off would otherwise
    // only surface as a straggler at the 100 TB tier.
    // an ISOLATED session (shared context, own SQLConf): suites run
    // concurrently against one TestSpark session, and mutating the
    // shared runtime conf mid-flight (broadcast threshold −1!) makes
    // unrelated suites' plans flake
    val s2 = spark.newSession()
    Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "262144",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
      .foreach { case (k, v) => s2.conf.set(k, v) }
    // per-row md5 payload: incompressible, so the hot key's shuffle
    // partition is measurably fat (a constant pad would lz4 away and
    // the size-based skew detector would see nothing)
    val big = s2.range(400000).selectExpr(
      "if(id < 350000, 0L, id) as k", "md5(cast(id as string)) as pad")
    val dim = s2.range(2000).selectExpr("id as k", "id * 2 as w")
    // the aggregate folds into THIS DataFrame's QueryExecution (and
    // consumes pad, keeping it in the shuffle), so the adaptive plan
    // inspected below is the one that actually ran
    val joined = big.join(dim, "k")
      .groupBy().agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("pad"))).as("s"))
    // only the hot key matches the dimension (ids ≥ 350000 miss it)
    assert(joined.collect().head.getLong(0) == 350000L * 32)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"OptimizeSkewedJoin did not fire on the planted hot key:\n${p.take(3000)}")
  }

  test("span removal is per-document array work: only the gram posexplode generates") {
    import org.apache.spark.sql.execution.GenerateExec
    // the rebuild must never posexplode the corpus into (doc_id, p, tok)
    // rows — covered positions aggregate to one bounded array per doc
    // and the surviving tokens filter inside the row, so the only
    // generator in the plan is the 8-gram posexplode of the flag stage
    for (name <- Seq("q_dup_spans_apply", "q_dup_spans_keep")) {
      val gens = SparkEntry.queries(name)(spark, dir)
        .queryExecution.sparkPlan.collect { case g: GenerateExec => g }
      assert(gens.size == 1,
        s"$name: expected only the gram posexplode Generate, got ${gens.size}")
    }
  }
  test("PQ ADC scoring broadcasts the query LUT; BM25 broadcasts its 3-term query") {
    // The compressed-domain scan must join the per-query lookup table
    // as a broadcast (one narrow projection over the code table, no
    // shuffle until the per-query top-k), and BM25's postings join must
    // broadcast the 3-row query-term table - a shuffled join on either
    // would move corpus-sized data for a handful of rows.
    val pq = plan(graft.operators.SimilarityPq.knnPq(spark, dir))
    assert(pq.contains("BroadcastNestedLoopJoin") || pq.contains("BroadcastExchange"),
      s"query LUT must broadcast:\n$pq")
    val bm = plan(graft.operators.TextAnalysis.bm25Search(spark, dir))
    assert(bm.contains("BroadcastExchange"), s"query terms must broadcast:\n$bm")
    graft.operators.Dedup.releaseIndexes(spark)
  }

  test("funnel stage joins reuse the user_id hash partitioning (no re-exchange before the stage agg)") {
    // Stage 2/3: join on user_id then groupBy user_id - the aggregation
    // must reuse the join's exchange. Count exchanges: one per event-scan
    // leg entering a join/agg, none BETWEEN a join and its follow-up agg.
    val p = plan(graft.operators.Events.funnel(spark, dir))
    // 3 stage scans + stage-1 agg exchanges are expected; a plan that
    // re-exchanges after each join would add 2 more. Pin the ceiling.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 6, s"funnel must not re-shuffle between stage join and agg ($exchanges):\n$p")
  }

  test("SCD2 history is one shuffle: both window passes share a partitioning") {
    val p = plan(graft.operators.Relational.scd2StatusHistory(spark, dir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"SCD2 must sort once per partitioning ($exchanges):\n$p")
  }

  test("ER best-match is a partially-aggregating argmax, not a ranking window") {
    val p = plan(q("q_name_match"))
    assert(!p.contains("Window"),
      s"best-match selection must not sort scored pairs through a window:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"argmax must combine map-side before the shuffle:\n$p")
  }

  test("snapshot diff is one full-outer join; PMI broadcasts its totals") {
    val d = plan(q("q_table_diff"))
    assert(d.contains("FullOuter"), s"diff must be a single full-outer join:\n$d")
    assert(!d.contains("CartesianProduct"), d)
    val pm = plan(q("q_text_pmi"))
    assert(pm.contains("BroadcastExchange"),
      s"the 1-row totals must broadcast, never shuffle the vocabulary:\n${pm.take(2000)}")
  }

  test("gap-fill grid explodes a broadcast span instead of rescanning events") {
    val p = plan(q("q_events_gapfill"))
    assert(p.contains("Generate explode"),
      s"the day grid must come from an exploded sequence:\n${p.take(2000)}")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the global span is a 1-row broadcast:\n${p.take(2000)}")
  }
}
