package graft.operators

import graft.SparkSpec

/** The composed e2e curation lineage (q_pipeline_e2e): stage algebra
  * invariants that must hold at ANY scale — monotone doc counts, exact
  * in/out chaining between consecutive stages, split completeness.
  * Value-level correctness is the 3-SF DuckDB oracle's job. */
class PipelineSpec extends SparkSpec {

  test("stage accounting chains exactly and shrinks monotonically") {
    val rows = Pipeline.pipelineE2e(spark, sf("sf0.01")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val byOrd = rows.map(r => r._1 -> r).toMap
    // the six doc stages chain: stage i's n_out IS stage i+1's n_in
    (1 to 5).foreach { i =>
      assert(byOrd(i)._5 == byOrd(i + 1)._4,
        s"stage $i n_out ${byOrd(i)._5} != stage ${i + 1} n_in ${byOrd(i + 1)._4}")
    }
    // every doc stage shrinks or holds, never grows; dropped balances
    rows.filter(_._3 == "docs").filter(_._1 <= 6).foreach { r =>
      assert(r._5 <= r._4, s"stage ${r._2} grew: $r")
      assert(r._6 == r._4 - r._5, s"stage ${r._2} drop accounting wrong: $r")
    }
    // pack consumes the mix survivors and yields at least one shard
    assert(byOrd(7)._4 == byOrd(6)._5 && byOrd(7)._5 > 0)
    // the splits partition the survivor set exactly
    val splits = rows.filter(_._1 >= 8)
    assert(splits.map(_._5).sum == byOrd(6)._5,
      s"splits ${splits.map(_._5).sum} != survivors ${byOrd(6)._5}")
    splits.foreach(r => assert(r._4 == byOrd(6)._5))
    // something real survives, something real is dropped
    assert(byOrd(6)._5 > 0 && byOrd(1)._4 > byOrd(6)._5)
    // the export manifest enumerates EXACTLY the shards stage 7
    // accounts for — same survivor chunk stream, same packing
    val manifest = Pipeline.packManifest(spark, sf("sf0.01")).collect()
    assert(manifest.length.toLong == byOrd(7)._5,
      s"manifest ${manifest.length} shards != stage-7 ${byOrd(7)._5}")
    assert(manifest.map(_.getLong(2)).sum > 0) // n_tokens flows
    Dedup.releaseIndexes(spark)
  }

  test("incremental window run ≡ the full pipeline's verdicts restricted to the window") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.01")
    val (lo, hi) = (Dedup.DemoWatermarkLo, Dedup.DemoWatermarkHi)
    val inc = Pipeline.pipelineE2eSince(spark, dir, lo, hi).collect()
      .map(r => r.getInt(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // independent ground truth: the FULL chain's per-stage survivor id
    // sets, restricted to the window by the spec itself
    def winIds(i: Int): Set[Long] = Pipeline.stageIds(spark, dir, i)
      .filter(col("doc_id") > lo && col("doc_id") <= hi)
      .collect().map(_.getLong(0)).toSet
    val deltaN = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") > lo && col("doc_id") <= hi).count()
    assert(deltaN > 0, "window empty — constants wrong for this SF")
    val counts = (1 to 6).map(i => i -> winIds(i).size.toLong).toMap
    assert(inc(1) == ((deltaN, counts(1), deltaN - counts(1))),
      s"stage 1 delta accounting wrong: ${inc(1)}")
    (2 to 6).foreach { i =>
      assert(inc(i) == ((counts(i - 1), counts(i), counts(i - 1) - counts(i))),
        s"stage $i delta accounting != full-chain restriction: ${inc(i)} vs " +
          s"(${counts(i - 1)}, ${counts(i)})")
    }
    // pack consumes exactly the window survivors; splits partition them
    assert(inc(7)._1 == counts(6))
    val splitOut = inc.filterKeys(_ >= 8).values.map(_._2).sum
    assert(splitOut == counts(6),
      s"delta splits $splitOut != window survivors ${counts(6)}")
    Dedup.releaseIndexes(spark)
  }

  test("incremental over the FULL id range degenerates to the full pipeline") {
    // the strongest cheap invariant the window parameterization must
    // hold: a window covering every doc id makes pipelineE2eSince and
    // pipelineE2e the same query — same stage counts, same shard
    // count, same split partition (the delta pack runs the same
    // cumsum over the same survivor chunk stream)
    val dir = sf("sf0.01")
    val full = Pipeline.pipelineE2e(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    val maxId = graft.sources.Tables.documents(spark, dir)
      .agg(org.apache.spark.sql.functions.max("doc_id")).collect()(0).getLong(0)
    val inc = Pipeline.pipelineE2eSince(spark, dir, Long.MinValue, maxId).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(inc.toSeq == full.toSeq,
      s"full-range incremental diverged from the full pipeline:\n${inc.toSeq}\nvs\n${full.toSeq}")
    Dedup.releaseIndexes(spark)
  }

  test("shard order: seeded hash permutation — replayable, epochs differ, each epoch complete") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val manifest = (0L until 37L).toDF("shard")
      .withColumn("n_chunks", lit(8L)).withColumn("n_tokens", lit(512L))
    def run(seed: Long) = Pipeline.shardOrderOf(manifest, seed, 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val a = run(42L)
    // replayable: a rerun is bit-identical (pure hash arithmetic, no RNG)
    assert(a.toSeq == run(42L).toSeq, "rerun diverged — the order is not deterministic")
    // each epoch is a complete permutation: positions 0..36, every shard once
    (0 to 2).foreach { e =>
      val ep = a.filter(_._1 == e)
      assert(ep.map(_._2).sorted.toSeq == (0L until 37L), s"epoch $e positions broken")
      assert(ep.map(_._3).sorted.toSeq == (0L until 37L), s"epoch $e shard set broken")
    }
    // epochs shuffle differently (that is the point of the epoch key)
    def orderOf(rows: Array[(Int, Long, Long)], e: Int): Seq[Long] =
      rows.filter(_._1 == e).sortBy(_._2).map(_._3).toSeq
    assert(orderOf(a, 0) != orderOf(a, 1) && orderOf(a, 1) != orderOf(a, 2),
      "epochs must produce different orders")
    // and the seed reshuffles too
    assert(orderOf(run(43L), 0) != orderOf(a, 0), "seed must change the order")
  }
}
