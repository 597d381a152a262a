package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Planted-sequence pins for the behavioral-analytics operators
  * (funnel / retention / transitions). The sf-scale numbers are
  * oracle-checked by the driver gate; these cases pin the SEMANTICS on
  * sequences small enough to verify by hand — strict-order funnel
  * progression, first-seen cohort assignment, and tie-broken
  * transition order. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long, String)*): DataFrame =
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
        "event_type", "CAST(1.0 AS DOUBLE) value", "'{}' props")

  test("funnel requires strictly increasing step times per user") {
    // u1 completes all three in order; u2 clicks BEFORE viewing (click
    // must not count); u3 views only; u4 has click+purchase but no view
    val rows = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "click"),
      (3L, "2024-01-01 10:10:00", 1L, "purchase"),
      (4L, "2024-01-01 09:00:00", 2L, "click"),
      (5L, "2024-01-01 09:30:00", 2L, "view"),
      (6L, "2024-01-01 11:00:00", 3L, "view"),
      (7L, "2024-01-01 08:00:00", 4L, "click"),
      (8L, "2024-01-01 08:05:00", 4L, "purchase"))
    val out = Events.funnelOf(rows).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("funnel step counts are monotonically non-increasing on real data") {
    val steps = Events.funnel(spark, sf("sf0.001")).collect().map(_.getLong(2))
    assert(steps.length === 3)
    assert(steps(0) >= steps(1) && steps(1) >= steps(2))
    assert(steps(0) > 0)
  }

  test("retention assigns each user to its first-seen day and counts later activity") {
    val rows = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view"),   // u1 cohort 01-01
      (2L, "2024-01-02 10:00:00", 1L, "click"),  // active offset 1
      (3L, "2024-01-02 18:00:00", 1L, "view"),   // same day — one active row
      (4L, "2024-01-02 09:00:00", 2L, "view"),   // u2 cohort 01-02
      (5L, "2024-01-20 09:00:00", 2L, "view"))   // offset 18 > 7 — dropped
    val out = Events.retentionCohortsOf(rows).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L), ("2024-01-02", 0, 1L)))
  }

  test("retention day-0 actives per cohort sum to the distinct user count") {
    val events = graft.sources.Tables.events(spark, sf("sf0.001"))
    val users = events.select("user_id").distinct().count()
    val day0 = Events.retentionCohorts(spark, sf("sf0.001"))
      .filter("day_offset = 0").agg(org.apache.spark.sql.functions.sum("n_active"))
      .collect()(0).getLong(0)
    assert(day0 === users)
  }

  test("transitions follow ts order with event_id tie-break") {
    val rows = ev(
      // u1: view -> click -> view; the tie at 10:05 orders by event_id
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "click"),
      (3L, "2024-01-01 10:05:00", 1L, "view"))
    val out = Events.typeTransitionsOf(rows).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("click", "view", 1L), ("view", "click", 1L)))
  }

  test("transition total equals events minus one per active user") {
    val events = graft.sources.Tables.events(spark, sf("sf0.001"))
    val n = events.count()
    val users = events.select("user_id").distinct().count()
    val total = Events.typeTransitions(spark, sf("sf0.001"))
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(total === n - users)
  }
  test("anomaly: a planted outlier event is flagged with the hand-computed z") {
    // A single outlier among n points scores z = sqrt(n-1) exactly
    // (independent of its magnitude - the deviation and the sd both
    // scale with it). n = 15 puts the outlier at sqrt(14) > 3 and
    // every base point at 1/sqrt(14) < 3: exactly one flag.
    val base = (1 to 14).map(i =>
      (i.toLong, f"2024-01-01 10:$i%02d:00", 1L, "click", 1.0))
    val rows = (base :+ (15L, "2024-01-01 11:00:00", 1L, "click", 101.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
        "event_type", "value", "'{}' props")
    val dir = java.nio.file.Files.createTempDirectory("graft-anom").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.valueAnomalies(spark, dir).collect()
    assert(out.length == 1 && out(0).getLong(1) == 15L, out.mkString(";"))
    assert(math.abs(out(0).getDouble(3) - math.sqrt(14.0)) < 1e-5,
      s"z mismatch: ${out(0)}")
  }

  test("MAD audit: a planted far point is an outlier; the median ignores it") {
    import spark.implicits._
    // 14 values at 1.0 and one at 101: median 1, MAD 0... MAD=0 flags
    // everything nonequal - so use a spread base instead: values
    // 1..15 plus one extreme. median=8.5? use odd count for stability.
    val base = (1 to 15).map(i => (i.toLong, f"2024-01-01 10:$i%02d:00", 1L, "click", i.toDouble))
    val rows = (base :+ (16L, "2024-01-01 11:00:00", 1L, "click", 500.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
        "event_type", "value", "'{}' props")
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.valueMadOutliers(spark, dir).collect()
    assert(out.length === 1)
    val r = out(0)
    // median of 1..15,500 = 8.5; adev median (MAD) = 4.0; only 500 is
    // beyond 8.5 +/- 12
    assert(r.getLong(1) === 16L)
    assert(math.abs(r.getDouble(2) - 8.5) < 1e-9, r.toString)
    assert(math.abs(r.getDouble(3) - 4.0) < 1e-9, r.toString)
    assert(r.getLong(4) === 1L, s"exactly the planted point: $r")
  }

  test("stream-parity audit: one row per head, window + split semantics hold") {
    import spark.implicits._
    // two users; user 1 completes the funnel inside day 1-2, user 2's
    // purchase lands on day 3 — OUTSIDE the fixed two-batch window, so
    // the funnel head must not count it (the window is the audit's
    // whole point: a twin that silently widened its replay would still
    // match an unwindowed recompute)
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 10:10:00", 1L, "click", 1.0),
      (3L, "2024-01-02 09:00:00", 1L, "purchase", 1.0),
      (4L, "2024-01-01 11:00:00", 2L, "view", 2.0),
      (5L, "2024-01-02 11:00:00", 2L, "click", 2.0),
      (6L, "2024-01-03 11:00:00", 2L, "purchase", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
        "event_type", "value", "'{}' props")
    val dir = java.nio.file.Files.createTempDirectory("graft-parity").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    // documents: doc 0 (stream side) duplicates doc 1 (corpus side) up
    // to whitespace/case — in_corpus must be true for its fingerprint;
    // doc 2 (stream side) is novel — in_corpus false
    Seq((0L, "Hello  World", "en", "a"), (1L, "hello world", "en", "a"),
      (2L, "novel text", "en", "a"))
      .toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "CAST(length(text) AS LONG) n_chars",
        "lang", "source")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = EventsModule.streamParityBatch(spark, dir).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("ewma", "funnel", "ingest_dedup"))
    val byHead = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // funnel: 3 step rows; step sums = 1*2 (both view) + 2*2 (both
    // click — user 2's click is on day 2, inside) + 3*1 (only user 1's
    // purchase is inside the window) = 9
    assert(byHead("funnel") === (3L, 9L), byHead.toString)
    // ewma: both users have in-window events; chk includes epoch-ms of
    // their last in-window ts + window sizes (2 and 2)
    assert(byHead("ewma")._1 === 2L)
    // ingest: stream fps = {norm("Hello  World"), norm("novel text")}
    // = 2 first-seen rows; one hits the corpus (doc 1's fp), keep_ids
    // 0 + 2 — chk = 2 + 1_000_000 * 1
    assert(byHead("ingest_dedup") === (2L, 1000002L), byHead.toString)
  }
}
