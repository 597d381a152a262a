package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Event-time analytics over the `events` table (SURVEY.md §2.10/E6) in
  * batch form — the same aggregations graft.streaming.EventStreams runs
  * incrementally with watermarks; batch/stream parity is pinned by
  * EventStreamsSpec. The reference's only temporal construct is the
  * coarse last-run-date watermark (`flows/main_flow.py:114,129-134`);
  * these queries are the engine's event-time surface.
  *
  * Scale posture: tumbling/sliding windows and sessions are single hash
  * aggregations after one shuffle on (window bucket | user). The
  * sliding window emits exactly duration/slide = 2 bucket rows per
  * event before the shuffle (no range explosion). Sums over the double
  * `value` column go through DECIMAL so partial-aggregation order can't
  * perturb the result, then finish as CAST(... AS DOUBLE) on both sides
  * so the driver gate sees one pandas dtype (same rule as Relational —
  * DuckDB decimal aggregates render float64, Spark parquet decimals
  * stay Decimal objects).
  */
object Events {

  private def dec(c: Column): Column = c.cast("decimal(18,6)")

  /** Tumbling 1-hour windows per event type: count + exact sum. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** Sliding 1-hour windows every 30 minutes: each event lands in
    * exactly two buckets. */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start")

  /** Session windows: 30-minute inactivity gap per user. Spark merges
    * per-event windows [ts, ts+gap); a new session starts exactly when
    * the gap to the previous event is >= 30 min (end-exclusive) — the
    * oracle's lag/cumsum formulation encodes the same boundary. */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Top-10 longest sessions (by event count, then duration): windows +
    * ranking composed over the session output. */
  def topSessions(spark: SparkSession, dir: String): DataFrame =
    sessions(spark, dir)
      .select(col("user_id"), col("session_start"), col("n_events"),
        // exact µs difference then integer-floor division — immune to
        // the engines' differing epoch-seconds truncation of fractional
        // timestamps (unix_timestamp floors, DuckDB's cast rounds)
        floor((unix_micros(col("session_end")) - unix_micros(col("session_start")))
          / lit(1000000L)).as("duration_sec"))
      .orderBy(col("n_events").desc, col("duration_sec").desc,
        col("user_id").asc, col("session_start").asc)
      .limit(10)

  /** Skew-safe aggregation: event_type has a handful of hot keys over
    * the whole table, so a naive groupBy concentrates each key's rows
    * in one reducer. Two-stage salted aggregation — partial sums on
    * (key, salt) across 16 buckets, then the final fold on the key —
    * spreads the hot keys; the salt is deterministic (event_id mod 16)
    * so replays and the oracle compare are stable. DECIMAL sums make
    * the two-stage result bit-equal to the one-stage plan the DuckDB
    * oracle runs. */
  def saltedTypeTotals(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), dec(col("value")).as("v"),
        pmod(col("event_id"), lit(16)).as("salt"))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("pv"))
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n_events"),
        sum(col("pv")).cast("double").as("sum_value"))
      .orderBy("event_type")

  /** JSON property extraction (reference F6 `json.loads`,
    * `flows/main_flow.py:68`): parse the props JSON string column with
    * an explicit schema, aggregate the extracted field. */
  def propsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), lit("k INT")).getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        round(sum(col("k")).cast("double") / count(col("k")), 6).as("avg_k"))
      .orderBy("event_type")
}

/** Driver-contract registration for the event-time set. */
object EventsModule extends QueryModule {
  import Events._

  def queries = Map(
    "q_events_tumbling" -> ((s: SparkSession, d: String) => tumbling(s, d)),
    "q_events_sliding" -> ((s: SparkSession, d: String) => sliding(s, d)),
    "q_events_sessions" -> ((s: SparkSession, d: String) => sessions(s, d)),
    "q_events_top_sessions" -> ((s: SparkSession, d: String) => topSessions(s, d)),
    "q_events_props_json" -> ((s: SparkSession, d: String) => propsJson(s, d)),
    "q_events_salted_agg" -> ((s: SparkSession, d: String) => saltedTypeTotals(s, d)))

  // DuckDB time_bucket's default origin (2000-01-03 for multi-day, else
  // 2000-01-01) sits on the same 30-min grid as Spark's epoch-aligned
  // windows, so bucket starts agree.
  def oracles = Map(
    "q_events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,
    "q_events_sliding" ->
      """WITH x AS (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                          time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE])
        |             AS window_start, value
        |           FROM events)
        |SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY window_start""".stripMargin,
    "q_events_sessions" ->
      """WITH x AS (SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, new_s DESC
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q_events_top_sessions" ->
      """WITH x AS (SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, new_s DESC
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM x),
        |s AS (SELECT user_id, min(ts) AS session_start,
        |        COUNT(*) AS n_events,
        |        (epoch_us(max(ts) + INTERVAL 30 MINUTE)
        |          - epoch_us(min(ts))) // 1000000 AS duration_sec
        |      FROM y GROUP BY user_id, sid)
        |SELECT user_id, session_start, n_events, duration_sec FROM s
        |ORDER BY n_events DESC, duration_sec DESC, user_id ASC, session_start ASC
        |LIMIT 10""".stripMargin,
    "q_events_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_events_props_json" ->
      """SELECT event_type,
        |  COUNT(CAST(props->>'k' AS INT)) AS n_with_k,
        |  CAST(SUM(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
        |  round(CAST(SUM(CAST(props->>'k' AS INT)) AS DOUBLE)
        |        / COUNT(CAST(props->>'k' AS INT)), 6) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
