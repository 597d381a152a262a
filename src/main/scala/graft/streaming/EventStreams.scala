package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders => SqlEncoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Open-session accumulator for sessionizeStateful (top-level: the
  * state encoder's generated code needs a public, conflict-free
  * constructor). */
case class OpenSession(startMs: Long, lastMs: Long, nEvents: Long, sumValue: Double)

/** Running per-user totals emitted by the transformWithState demo. */
case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

/** Per-user funnel state: first-touch times of the three steps
  * (fixed-size state — see funnelStateful). */
case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long])

/** One buffered funnel event awaiting watermark finalization. */
case class FunnelBufEvent(tsMs: Long, id: Long, typ: String)

/** Out-of-order-tolerant funnel state: the FINALIZED machine (only
  * events at or below the watermark have been folded in — nothing
  * that can still be reordered), the buffered events still inside the
  * watermark horizon, and the last PROVISIONAL state emitted (change
  * detection). Bounded by the horizon × per-user rate, not by the
  * stream — the price of exact out-of-order funnels, same bound as
  * every windowed aggregation under the same watermark. */
case class FunnelBufState(fin: FunnelState, buf: Seq[FunnelBufEvent],
                          emitted: FunnelState)

/** Trailing-window EWMA state: the last ≤20 values OLDEST-FIRST plus
  * the latest event's (ts, id) — fixed-size per user regardless of
  * stream length (see ewmaStateful). */
case class EwmaState(vals: Seq[Double], lastTsMs: Long, lastId: Long)

/** One buffered EWMA event awaiting watermark finalization. */
case class EwmaBufEvent(tsMs: Long, id: Long, value: Double)

/** Out-of-order-tolerant EWMA state — the funnel discipline applied
  * to the trailing window: the FINALIZED window (≤ watermark, ordered
  * fold), the in-horizon buffer, and the last emitted feature row
  * (change detection). */
case class EwmaBufState(fin: EwmaState, buf: Seq[EwmaBufEvent],
                        emitted: Option[UserEwma])

/** Smoothed-activity feature row: the user's EWMA at their latest
  * event — the streaming twin of Events.ewmaLatest's output. */
case class UserEwma(user_id: Long, last_ts: Timestamp, n_window: Int,
                    ewma: Double)

/** Funnel progression row: the user's currently-reached step and the
  * first-touch timestamps behind it. */
case class FunnelProgress(user_id: Long, step: Int, t1: Timestamp,
                          t2: Timestamp, t3: Timestamp)

/** Arbitrary-state v2 (`transformWithState` StatefulProcessor,
  * Spark 4): one ValueState cell per user holding (count, sum),
  * emitting the updated totals once per micro-batch. Requires the
  * RocksDB state store provider (bundled); TTLConfig.NONE keeps state
  * forever — production sets a TTL to bound it, the knob
  * flatMapGroupsWithState lacks. */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, EventStreams.Event, UserRunning] {

  @transient private var totals: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Double)](
      "totals", SqlEncoders.tuple(SqlEncoders.scalaLong, SqlEncoders.scalaDouble),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[EventStreams.Event],
      timerValues: TimerValues): Iterator[UserRunning] = {
    val (n0, s0) = Option(totals.get()).getOrElse((0L, 0.0))
    var n = n0
    var s = s0
    rows.foreach { e => n += 1; s += e.value }
    totals.update((n, s))
    Iterator.single(UserRunning(key, n, s))
  }
}

/** Structured Streaming surface (SURVEY.md §2.10 E6). The reference's
  * incremental model is a persisted last-run date re-filtered each run
  * (`flows/main_flow.py:114,129-134`) — at-least-once, no late-data
  * handling. This module is the streaming-native upgrade: checkpointed
  * source offsets replace the date file, `withWatermark` bounds state
  * and late data, and the aggregations are the same ones
  * graft.operators.Events runs in batch (parity pinned by
  * EventStreamsSpec).
  *
  * Every transform takes a DataFrame/Dataset so it composes with any
  * source (`readStream.parquet/kafka/...` in production, MemoryStream
  * in tests) — `readEventStream` wires the parquet file source used by
  * the testdata layout.
  *
  * Scale posture: all stateful ops key their state by (window |
  * user_id) and expire it by watermark, so state size is bounded by
  * active keys × window horizon, not by history; shuffle partitioning
  * matches the batch plans.
  */
object EventStreams {

  /** Event row of the `events` table (TESTDATA.md). */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** One closed (or timed-out) user session. */
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, sum_value: Double)



  /** File-stream source over the testdata events directory: the
    * streaming twin of Tables.events. A file-stream source needs its
    * schema declared up front, so the twin peeks at the directory's
    * BATCH schema once (driver-side, at stream definition) to pick the
    * same layout branch Tables.events picks per-read: nanos-as-long
    * testdata gets the nanos→micros conversion; native-timestamp
    * parquet (what Spark itself writes) streams through unconverted —
    * previously the BIGINT layout was hardcoded and a native-timestamp
    * directory failed its first micro-batch on schema mismatch. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = graft.sources.Tables.rawEventsTsType(spark, dir)
    val tsDecl = tsType match {
      case LongType         => "ts BIGINT"
      case TimestampNTZType => "ts TIMESTAMP_NTZ"
      case _                => "ts TIMESTAMP"
    }
    val schema = s"event_id BIGINT, $tsDecl, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir")
    tsType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // UTC-pinned session (Verify/Bench): lossless relabel to LTZ, same
      // normalization Tables.events applies on the batch path.
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling 1-hour counts with a late-data watermark — the streaming
    * twin of Events.tumbling. */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows with watermark — streaming twin of Events.sessions
    * (built-in merging session state). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Exactly-once-per-id dedup with bounded state: drops any event_id
    * seen within the watermark horizon — the streaming repair for the
    * reference's duplicating INSERT sink (SURVEY.md §7.4 at-least-once
    * note). */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each error event joined to the
    * click events of the same user in the preceding `horizon` — the
    * streaming counterpart of the batch as-of join (Relational
    * .asofJoin finds the latest click; this emits every click in the
    * window, the shape stream-stream joins support with bounded
    * state). Both sides carry watermarks and the join condition
    * bounds event-time distance, so Spark can expire buffered rows:
    * state is O(active users × horizon), not history. */
  def errorClickJoin(events: DataFrame, horizon: String = "1 hour",
                     watermark: String = "1 hour"): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("error_ts"))
      .withWatermark("error_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    errors.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("error_ts") &&
        col("click_ts") >= col("error_ts") - expr(s"INTERVAL $horizon"))
      .select("error_id", "user_id", "error_ts", "click_id", "click_ts")
  }

  /** LEFT OUTER twin of [[errorClickJoin]]: errors with NO click in
    * the horizon emit too, with null click fields — the unmatched-error
    * half an incident pipeline needs ("errors with no preceding
    * interaction"). Emission timing is the outer-join watermark
    * contract: a matched pair emits as soon as both rows meet, but the
    * NULL row for an unmatched error can only emit once the CLICK
    * watermark has passed `error_ts` (until then a matching click
    * could still arrive in-horizon) — so null rows trail the stream by
    * the watermark, exactly once, and state stays bounded by the same
    * interval condition as the inner join. EventStreamsSpec pins both
    * halves against the batch twin (Events.errorClickPairsOuterOf),
    * including that the null row does NOT emit before a
    * watermark-advancing later batch. */
  def errorClickJoinOuter(events: DataFrame, horizon: String = "1 hour",
                          watermark: String = "1 hour"): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("error_ts"))
      .withWatermark("error_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    errors.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("error_ts") &&
        col("click_ts") >= col("error_ts") - expr(s"INTERVAL $horizon"),
      "leftOuter")
      .select("error_id", "user_id", "error_ts", "click_id", "click_ts")
  }

  /** Streaming → sink integration: every micro-batch of closed
    * sessions lands through the same partition-batched object sink the
    * batch path uses (foreachBatch bridges streaming to any batch
    * sink). Exactly-once effects via the batchId-keyed commit wrapper
    * (Sinks.exactlyOnceBatch): a replayed completed batch is skipped
    * outright, a crash mid-batch replays onto overwrite-by-key object
    * writes — SURVEY.md §2.1 S5 + §7.4 at-least-once note. */
  def writeSessionsAsObjects(sessions: Dataset[Session], outDir: String,
                             checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val landBatch = graft.sinks.Sinks.exactlyOnceBatch(s"$outDir/_commits") {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val df = batch
          .withColumn("obj_key", concat_ws("_",
            col("user_id"), unix_micros(col("session_start"))))
          .withColumn("obj_key", concat(col("obj_key"), lit(".json")))
          .withColumn("payload", to_json(struct(
            col("user_id"), col("session_start"), col("session_end"),
            col("n_events"), col("sum_value"))))
        graft.sinks.Sinks.writeObjectPerRow(df, "obj_key", "payload", outDir)
    }
    sessions.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch((b: Dataset[Session], id: Long) => landBatch(b.toDF(), id))
      .start()
  }

  /** Per-user running totals via the Spark 4 arbitrary-state v2 API
    * (`transformWithState`): Update-mode emission of the cumulative
    * (count, sum) per user per micro-batch. See RunningTotalsProcessor
    * for the state layout. */
  def runningTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * hand-rolled twin of sessionCounts, demonstrating arbitrary state:
    * one OpenSession per user, closed either by an in-batch gap or by
    * the event-time timeout when the watermark passes last_ts + gap.
    * Emits each closed session exactly once (Append mode). */
  def sessionizeStateful(events: Dataset[Event], gapMinutes: Int = 30,
                         watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def toSession(uid: Long, s: OpenSession): Session =
      Session(uid, new Timestamp(s.startMs), new Timestamp(s.lastMs + gapMs),
        s.nEvents, s.sumValue)

    def update(uid: Long, it: Iterator[Event],
               state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(toSession(uid, _)).toSeq
        state.remove()
        out.iterator
      } else {
        // Merge the batch's events and the carried-over open session as
        // INTERVALS under the gap rule, in start order. This is what
        // makes in-watermark OUT-OF-ORDER arrivals correct: an event
        // in-gap BEFORE the open session extends its start downward
        // (a signed `t - lastMs < gap` test alone would merge it while
        // keeping the later start — membership and session_start would
        // diverge from the built-in session_window twin), and an event
        // more than a gap earlier forms its own session instead of
        // folding into one it doesn't belong to. State keeps only the
        // LATEST session open (single-open-session model): sessions
        // that close earlier in the merge emit immediately and cannot
        // absorb later stragglers — the documented simplification
        // relative to the built-in twin, which keeps every
        // within-watermark session mergeable.
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val items = (state.getOption.toSeq ++
          sorted.map(e => OpenSession(e.ts.getTime, e.ts.getTime, 1, e.value)))
          .sortBy(s => (s.startMs, s.lastMs))
        val merged = items.foldLeft(List.empty[OpenSession]) { (acc, s) =>
          acc match {
            case cur :: rest if s.startMs - cur.lastMs < gapMs =>
              OpenSession(cur.startMs, math.max(cur.lastMs, s.lastMs),
                cur.nEvents + s.nEvents, cur.sumValue + s.sumValue) :: rest
            case _ => s :: acc
          }
        }.reverse
        val closed = merged.init.map(toSession(uid, _))
        val open = merged.last
        state.update(open)
        state.setTimeoutTimestamp(open.lastMs + gapMs)
        closed.iterator
      }
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Incremental conversion funnel: the streaming twin of
    * [[graft.operators.Events.funnel]] — per-user state machine
    * (first view → first later click → first later purchase),
    * OUT-OF-ORDER TOLERANT within the watermark (the sessionizer's
    * interval-merge discipline applied to a state machine):
    *
    *  - events at or below the current watermark FINALIZE, folded
    *    into the state machine in (ts, event_id) order — the same
    *    total order every batch oracle uses; nothing that can still
    *    be reordered is baked in;
    *  - events above the watermark BUFFER (bounded by the horizon ×
    *    per-user rate), and the emitted progression is the
    *    PROVISIONAL fold of finalized + buffered — so a late step-2
    *    arriving after step-3 still slots between them and unlocks
    *    the step-3 progression, exactly as the batch funnel sees it;
    *  - an event-time timer at the earliest buffered timestamp
    *    finalizes the buffer when the watermark passes it even if the
    *    user never sends another event;
    *  - a straggler later than the watermark allows is DROPPED by
    *    the engine's late-data filter before it reaches the state
    *    function (flatMapGroupsWithState under an event-time timeout
    *    filters sub-watermark rows) — the same droppable-late
    *    contract as every watermarked aggregation; the batch twin
    *    stays the reprocessing ground truth. Size the horizon to the
    *    source's real disorder: the default is deliberately generous
    *    because funnel state is tiny.
    *
    * Under in-order delivery the provisional fold reproduces the old
    * immediate-emission behavior row for row (parity pinned in
    * EventStreamsSpec). */
  def funnelStateful(events: Dataset[Event],
                     watermark: String = "2 hours"): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._

    def advance(st: FunnelState, e: FunnelBufEvent): FunnelState = e.typ match {
      case "view" if st.t1.isEmpty => st.copy(t1 = Some(e.tsMs))
      case "click" if st.t2.isEmpty &&
        st.t1.exists(e.tsMs > _) => st.copy(t2 = Some(e.tsMs))
      case "purchase" if st.t3.isEmpty &&
        st.t2.exists(e.tsMs > _) => st.copy(t3 = Some(e.tsMs))
      case _ => st
    }

    def progressOf(uid: Long, st: FunnelState): FunnelProgress =
      FunnelProgress(uid,
        Seq(st.t1, st.t2, st.t3).count(_.isDefined),
        st.t1.map(new Timestamp(_)).orNull,
        st.t2.map(new Timestamp(_)).orNull,
        st.t3.map(new Timestamp(_)).orNull)

    def update(uid: Long, it: Iterator[Event],
               state: GroupState[FunnelBufState]): Iterator[FunnelProgress] = {
      val empty = FunnelState(None, None, None)
      val st0 = state.getOption.getOrElse(FunnelBufState(empty, Nil, empty))
      val wm = state.getCurrentWatermarkMs()
      val sorted =
        (st0.buf ++ it.map(e => FunnelBufEvent(e.ts.getTime, e.event_id, e.event_type)))
          .sortBy(b => (b.tsMs, b.id))
      val (ripe, rest) = sorted.partition(_.tsMs <= wm)
      val fin = ripe.foldLeft(st0.fin)(advance)
      val provisional = rest.foldLeft(fin)(advance)
      state.update(FunnelBufState(fin, rest, provisional))
      // finalize the buffer when the watermark passes its head, even
      // if this user never sends another event
      if (rest.nonEmpty) state.setTimeoutTimestamp(rest.head.tsMs)
      if (provisional != st0.emitted) Iterator.single(progressOf(uid, provisional))
      else Iterator.empty
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBufState, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming twin of `Events.ewmaLatest`: the trailing decay-0.9
    * EWMA of each user's last 20 values, updated incrementally — the
    * smoothed-activity feature served fresh instead of recomputed per
    * batch. State is FIXED-SIZE (≤20 doubles + the latest key) no
    * matter how long the stream runs.
    *
    * Numeric parity with the batch query is exact, not approximate:
    * products are rounded into DECIMAL(scale 12) half-up — precisely
    * what Spark's `cast(v*w as decimal(28,12))` does — summed exactly
    * (decimal addition is order-proof), divided once as doubles, and
    * half-up rounded at 6 dp like Spark's `round`. The weight table is
    * the same [[graft.operators.Events.EwmaWeights]] literal list.
    *
    * OUT-OF-ORDER TOLERANT within the watermark, the
    * [[funnelStateful]] discipline: sub-watermark events finalize
    * into the trailing window in (ts, event_id) order, in-horizon
    * events buffer, and the emitted feature is the provisional fold
    * of both — a delayed reading slots into its TRUE position, so
    * the served window equals the batch query's, not arrival
    * order's. An event-time timer flushes the buffer; stragglers
    * past the horizon follow the droppable-late contract (size the
    * horizon to the source's real disorder). */
  def ewmaStateful(events: Dataset[Event],
                   watermark: String = "2 hours"): Dataset[UserEwma] = {
    import events.sparkSession.implicits._
    val weights = graft.operators.Events.EwmaWeights
    val cap = weights.size

    def ewmaOf(st: EwmaState): UserEwma = {
      // vals are oldest-first; weight index j = 1-based rank from the
      // NEWEST — identical to the batch query's row_number desc rank
      val n = st.vals.size
      val half = java.math.RoundingMode.HALF_UP
      var num = java.math.BigDecimal.ZERO
      var den = java.math.BigDecimal.ZERO
      var i = 0
      while (i < n) {
        val w = weights(n - 1 - i)
        num = num.add(java.math.BigDecimal.valueOf(st.vals(i) * w)
          .setScale(12, half))
        den = den.add(java.math.BigDecimal.valueOf(w).setScale(12, half))
        i += 1
      }
      val q = num.doubleValue() / den.doubleValue()
      UserEwma(0L, new Timestamp(st.lastTsMs), n,
        java.math.BigDecimal.valueOf(q).setScale(6, half).doubleValue())
    }

    def fold(s: EwmaState, e: EwmaBufEvent): EwmaState =
      EwmaState((s.vals :+ e.value).takeRight(cap), e.tsMs, e.id)

    def update(uid: Long, it: Iterator[Event],
               state: GroupState[EwmaBufState]): Iterator[UserEwma] = {
      val st0 = state.getOption.getOrElse(
        EwmaBufState(EwmaState(Vector.empty, 0L, 0L), Nil, None))
      val wm = state.getCurrentWatermarkMs()
      val sorted =
        (st0.buf ++ it.map(e => EwmaBufEvent(e.ts.getTime, e.event_id, e.value)))
          .sortBy(b => (b.tsMs, b.id))
      val (ripe, rest) = sorted.partition(_.tsMs <= wm)
      val fin = ripe.foldLeft(st0.fin)(fold)
      val prov = rest.foldLeft(fin)(fold)
      val out =
        if (prov.vals.isEmpty) None
        else Some(ewmaOf(prov).copy(user_id = uid))
      state.update(EwmaBufState(fin, rest, out.orElse(st0.emitted)))
      if (rest.nonEmpty) state.setTimeoutTimestamp(rest.head.tsMs)
      if (out.isDefined && out != st0.emitted) out.iterator else Iterator.empty
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaBufState, UserEwma](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
