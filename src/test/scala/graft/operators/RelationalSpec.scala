package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

/** Relational flagship set — semantics pinned against hand-computable
  * fixtures; the sf0.01 DuckDB oracle (tools/check_oracle.py) covers
  * the full-table results.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Write a minimal events table (driver testdata schema) to a temp
    * dir so asofJoin can read it through the normal Tables loader. */
  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("asofJoin: inclusive — a click at exactly the error's timestamp is matched") {
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 7L, "click", 0.0, "{}"),
      // tie: click and error at the same instant → asof (e.ts >= c.ts) matches it
      (3L, ts("2024-01-01 10:10:00"), 7L, "click", 0.0, "{}"),
      (4L, ts("2024-01-01 10:10:00"), 7L, "error", 0.0, "{}")))
    val out = Relational.asofJoin(spark, dir)
      .select("event_id", "last_click_ts").as[(Long, Timestamp)].collect()
    assert(out.toSeq == Seq((4L, ts("2024-01-01 10:10:00"))))
  }

  test("asofJoin: error before any click gets null; later error gets most recent prior click") {
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-01 09:00:00"), 7L, "error", 0.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 10:05:00"), 7L, "click", 0.0, "{}"),
      (4L, ts("2024-01-01 11:00:00"), 7L, "error", 0.0, "{}"),
      // other user's clicks must not leak across the partition key
      (5L, ts("2024-01-01 10:30:00"), 8L, "click", 0.0, "{}"),
      (6L, ts("2024-01-01 10:45:00"), 8L, "error", 0.0, "{}")))
    val out = Relational.asofJoin(spark, dir)
      .select("event_id", "last_click_ts").collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)))).toSeq
    assert(out == Seq(
      (1L, None),
      (4L, Some(ts("2024-01-01 10:05:00"))),
      (6L, Some(ts("2024-01-01 10:30:00")))))
  }
  test("scd2: consecutive same-status orders collapse; reverts open new versions") {
    import spark.implicits._
    // customer 1: O, O, F, O  -> versions O, F, O (revert = NEW version)
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2").toString
    Seq(
      (1L, 7L, "O", "1995-01-01"), (2L, 7L, "O", "1995-02-01"),
      (3L, 7L, "F", "1995-03-01"), (4L, 7L, "O", "1995-04-01"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
      .selectExpr("o_orderkey", "o_custkey", "'1-URGENT' o_orderpriority",
        "o_orderstatus", "CAST(o_orderdate AS DATE) o_orderdate",
        "CAST(100.0 AS DOUBLE) o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Relational.scd2StatusHistory(spark, dir).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getDate(3).toString,
        Option(r.getDate(4)).map(_.toString), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1, "O", "1995-01-01", Some("1995-03-01"), false),
      (2, "F", "1995-03-01", Some("1995-04-01"), false),
      (3, "O", "1995-04-01", None, true)))
  }
  test("point-in-time join maps each fact to exactly one valid version") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pit").toString
    Seq(
      (1L, 7L, "O", "1995-01-01"), (2L, 7L, "O", "1995-02-01"),
      (3L, 7L, "F", "1995-03-01"), (4L, 7L, "O", "1995-04-01"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
      .selectExpr("o_orderkey", "o_custkey", "'1-URGENT' o_orderpriority",
        "o_orderstatus", "CAST(o_orderdate AS DATE) o_orderdate",
        "CAST(100.0 AS DOUBLE) o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Relational.pitJoin(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(3), r.getString(4)))
    assert(out.length == 4, "each fact must match exactly one version interval")
    assert(out.toMap === Map(
      1L -> (1, "O"), 2L -> (1, "O"), 3L -> (2, "F"), 4L -> (3, "O")))
  }

  test("table diff accounting matches the mutation rule exactly") {
    val dir = sf("sf0.001")
    val n = graft.sources.Tables.customer(spark, dir).count()
    val keys = graft.sources.Tables.customer(spark, dir)
      .select("c_custkey").collect().map(_.getLong(0))
    val removed = keys.count(_ % 13 == 3).toLong
    val added = keys.count(_ % 101 == 5).toLong
    val changed = keys.count(k => k % 13 != 3 && k % 7 == 0).toLong
    val out = Relational.tableDiff(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.getOrElse("removed", 0L) === removed)
    assert(out.getOrElse("added", 0L) === added)
    assert(out.getOrElse("changed", 0L) === changed)
    assert(out.values.sum === n + added, "every key classified exactly once")
  }
}
