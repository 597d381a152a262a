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
}
