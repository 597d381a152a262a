package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-11 additions: blocked entity resolution,
  * gap-fill/EWMA time-series features, PMI collocations, and
  * containment near-dup. Value-level parity with DuckDB is the
  * per-round CORRECTNESS gate; these pin structural properties that
  * hold on any corpus. */
class LinkageSpec extends SparkSpec {

  test("name match: every dirty record gets exactly one best match") {
    val out = Linkage.nameMatch(spark, sf("sf0.001")).collect()
    val total = out.map(_.getLong(1)).sum
    val nCust = graft.sources.Tables.customer(spark, sf("sf0.001")).count()
    assert(total === nCust, s"matched $total of $nCust")
    // scores are similarities in (0, 1]
    assert(out.forall(r => r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
  }

  test("name match: digit-reversal corruption is mostly recovered") {
    val out = Linkage.nameMatch(spark, sf("sf0.001")).collect()
    val total = out.map(_.getLong(1)).sum.toDouble
    val correct = out.map(_.getLong(2)).sum.toDouble
    // names share a long prefix, so Jaro-Winkler must still pick the
    // true record for a clear majority of the registry
    assert(correct / total > 0.5, s"accuracy ${correct / total}")
  }

  test("gapfill: complete users x days grid, gap rows marked and filled") {
    val out = Events.gapfillDaily(spark, sf("sf0.001"))
    val ev = graft.sources.Tables.events(spark, sf("sf0.001"))
    val users = ev.select("user_id").distinct().count()
    val days = ev.select(date_trunc("DAY", col("ts")).as("d"))
      .agg(datediff(max(col("d")), min(col("d")))).collect()(0).getInt(0) + 1
    assert(out.count() === users * days)
    // a day is a gap exactly when it has no events; filled value only
    // null before the user's first active day
    assert(out.filter(col("is_gap") =!= (col("n_events") === 0L)).count() === 0)
    val firstActive = out.filter(!col("is_gap"))
      .groupBy("user_id").agg(min(col("day")).as("d0"))
    assert(out.join(firstActive, "user_id")
      .filter(col("day") >= col("d0") && col("sum_value_filled").isNull)
      .count() === 0)
  }

  test("ewma: one row per user, window capped, value inside data range") {
    val out = Events.ewmaLatest(spark, sf("sf0.001"))
    val ev = graft.sources.Tables.events(spark, sf("sf0.001"))
    assert(out.count() === ev.select("user_id").distinct().count())
    assert(out.filter(col("n_window") > Events.EwmaWeights.size).count() === 0)
    val range = ev.agg(min("value"), max("value")).collect()(0)
    val (lo, hi) = (range.getDouble(0), range.getDouble(1))
    // a convex combination of observed values stays inside their range
    assert(out.filter(col("ewma") < lo - 1e-6 || col("ewma") > hi + 1e-6)
      .count() === 0)
  }

  test("pmi: reported pairs meet the min count and are genuine bigrams") {
    val out = TextAnalysis.pmiCollocations(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty && out.length <= 25)
    assert(out.forall(_.getLong(2) >= 5), "n_pair below min count")
    // PMI of a reported collocation should exceed independence (> 0)
    // for at least the top pair on any non-degenerate corpus
    assert(out.head.getDouble(5) > 0.0)
  }

  test("containment dominates jaccard; gap is their difference") {
    val out = Dedup.containmentPairs(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty && out.length <= 20)
    for (r <- out) {
      val (cont, jac, gap) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(cont >= jac - 1e-9, s"containment $cont < jaccard $jac")
      assert(math.abs(gap - (cont - jac)) < 2e-6)
    }
  }
}
