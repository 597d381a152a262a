package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming semantics: batch/stream parity for windowed aggregation,
  * watermark-bounded dedup, and stateful sessionization (in-batch gap
  * close + event-time timeout close). */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._
  import EventStreams._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, uid: Long, typ: String = "click", v: Double = 1.0) =
    Event(id, ts(t), uid, typ, v)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("file-stream source reads the real events table incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evt-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-evt-ckpt").toString
    // stage the driver parquet into a directory the file source watches
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val stream = EventStreams.readEventStream(spark, dir)
    val q = stream.writeStream.format("memory").queryName("rawev")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    withQuery(q) {
      q.processAllAvailable()
      assert(spark.table("rawev").count() == 1000)
      val t = spark.table("rawev").schema("ts").dataType
      assert(t == org.apache.spark.sql.types.TimestampType, t.toString)
    }
  }

  test("streaming tumbling counts equal the batch aggregation (complete mode)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val q = tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    withQuery(q) {
      input.addData(
        ev(1, "2024-01-01 10:05:00", 1), ev(2, "2024-01-01 10:55:00", 1),
        ev(3, "2024-01-01 11:05:00", 2, "error", 2.5))
      q.processAllAvailable()
      input.addData(ev(4, "2024-01-01 11:40:00", 2, "error", 0.5))
      q.processAllAvailable()
      val streamed = spark.table("tumb")
        .select("window_start", "event_type", "n_events")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(streamed == Set(
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 11:00:00"), "error", 2L)))
    }
  }

  test("dropDuplicatesWithinWatermark drops a replayed event_id") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val q = dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    withQuery(q) {
      input.addData(ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:01:00", 1))
      q.processAllAvailable()
      input.addData(ev(1, "2024-01-01 10:00:00", 1)) // replay within horizon
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    }
  }

  test("stateful sessionization: gap closes in-batch, timeout closes via watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionizeStateful(input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    withQuery(q) {
      // user 1: two events 10 min apart, then a 40-min gap → first
      // session closes in-batch when the third event arrives.
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1),
        ev(2, "2024-01-01 10:10:00", 1, v = 2.0),
        ev(3, "2024-01-01 10:50:00", 1))
      q.processAllAvailable()
      val inBatch = spark.table("sess").as[Session].collect()
      assert(inBatch.toSeq == Seq(
        Session(1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:40:00"), 2, 3.0)))
      // a far-future event for user 2 advances the watermark past
      // user 1's open-session timeout (10:50 + 30min + 1h watermark)
      input.addData(ev(9, "2024-01-01 14:00:00", 2))
      q.processAllAvailable()
      input.addData(ev(10, "2024-01-01 14:01:00", 2))
      q.processAllAvailable()
      val after = spark.table("sess").as[Session].collect()
      assert(after.exists(s =>
        s.user_id == 1L && s.session_start == ts("2024-01-01 10:50:00") &&
          s.session_end == ts("2024-01-01 11:20:00") && s.n_events == 1))
    }
  }

  test("stateful sessionization: in-watermark out-of-order arrivals merge as intervals") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionizeStateful(input.toDS())
      .writeStream.format("memory").queryName("sess_ooo").outputMode("append").start()
    withQuery(q) {
      input.addData(ev(1, "2024-01-01 12:00:00", 1))
      q.processAllAvailable() // open session at 12:00; watermark 11:00
      // two in-watermark stragglers: 11:45 is in-gap BEFORE the open
      // session (must extend its start downward, not keep 12:00), and
      // 11:05 is more than a gap earlier (must become its own session,
      // closed immediately — not fold into the 12:00 session)
      input.addData(
        ev(2, "2024-01-01 11:45:00", 1, v = 2.0),
        ev(3, "2024-01-01 11:05:00", 1, v = 5.0))
      q.processAllAvailable()
      val early = spark.table("sess_ooo").as[Session].collect().toSeq
      assert(early == Seq(
        Session(1L, ts("2024-01-01 11:05:00"), ts("2024-01-01 11:35:00"), 1, 5.0)),
        s"gapped-early straggler must close as its own session, got $early")
      // flush the open session via the event-time timeout
      input.addData(ev(9, "2024-01-01 15:00:00", 2))
      q.processAllAvailable()
      input.addData(ev(10, "2024-01-01 15:01:00", 2))
      q.processAllAvailable()
      val flushed = spark.table("sess_ooo").as[Session].collect()
      assert(flushed.exists(s =>
        s.user_id == 1L && s.session_start == ts("2024-01-01 11:45:00") &&
          s.session_end == ts("2024-01-01 12:30:00") &&
          s.n_events == 2 && s.sum_value == 3.0),
        s"in-gap straggler must extend the open session's start, got ${flushed.toSeq}")
    }
  }

  test("streaming parquet sink appends watermark-finalized windows exactly once") {
    implicit val sq = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-pq").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-pq-ckpt").toString
    val input = MemoryStream[Event]
    val q = tumblingCounts(input.toDF(), watermark = "10 minutes")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    withQuery(q) {
      input.addData(ev(1, "2024-01-01 10:05:00", 1), ev(2, "2024-01-01 10:20:00", 1))
      q.processAllAvailable()
      // watermark (max 10:20 - 10min = 10:10) has not passed 11:00 → nothing final
      input.addData(ev(3, "2024-01-01 11:30:00", 2))
      q.processAllAvailable()
      input.addData(ev(4, "2024-01-01 11:40:00", 2)) // watermark 11:30 > 11:00
      q.processAllAvailable()
      val rows = spark.read.parquet(outDir)
        .select("window_start", "event_type", "n_events")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows == Set((ts("2024-01-01 10:00:00"), "click", 2L)))
    }
  }

  test("transformWithState running totals accumulate across micro-batches (RocksDB store)") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = EventStreams.runningTotals(input.toDS())
        .writeStream.format("memory").queryName("running").outputMode("update").start()
      withQuery(q) {
        input.addData(ev(1, "2024-01-01 10:00:00", 1, v = 2.0),
          ev(2, "2024-01-01 10:01:00", 1, v = 3.0))
        q.processAllAvailable()
        input.addData(ev(3, "2024-01-01 10:02:00", 1, v = 5.0),
          ev(4, "2024-01-01 10:02:30", 2, v = 1.0))
        q.processAllAvailable()
        val rows = spark.table("running").as[UserRunning].collect()
        // batch 1 emitted (1, 2, 5.0); batch 2 emitted (1, 3, 10.0) and (2, 1, 1.0)
        assert(rows.contains(UserRunning(1L, 2L, 5.0)))
        assert(rows.contains(UserRunning(1L, 3L, 10.0)))
        assert(rows.contains(UserRunning(2L, 1L, 1.0)))
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("foreachBatch lands closed sessions as one JSON object each") {
    implicit val sq = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft-sess-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sess-ckpt").toString
    val input = MemoryStream[Event]
    val q = writeSessionsAsObjects(sessionizeStateful(input.toDS()), outDir, ckpt)
    withQuery(q) {
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1),
        ev(2, "2024-01-01 10:10:00", 1),
        ev(3, "2024-01-01 12:00:00", 1)) // 110-min gap closes the first session
      q.processAllAvailable()
      // _commits holds the exactly-once batch markers, not objects
      val files = new java.io.File(outDir).listFiles()
        .filterNot(f => f.getName.startsWith(".") || f.getName == "_commits")
      assert(files.map(_.getName).toSet == Set("1_1704103200000000.json"))
      val txt = new String(java.nio.file.Files.readAllBytes(files.head.toPath), "UTF-8")
      assert(txt.contains("\"n_events\":2"))
      assert(new java.io.File(s"$outDir/_commits").listFiles()
        .exists(_.getName.startsWith("batch-")),
        "the object sink must publish its batch commit markers")
    }
  }

  test("stream-stream interval join pairs errors with preceding clicks only") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val q = errorClickJoin(input.toDF())
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    withQuery(q) {
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1),                       // click u1
        ev(2, "2024-01-01 10:20:00", 1, "error"),              // error u1 ← joins click 1
        ev(3, "2024-01-01 10:30:00", 2),                       // click u2 (other user)
        ev(4, "2024-01-01 12:30:00", 1, "error"))              // error u1, >1h after click 1
      q.processAllAvailable()
      // advance both watermarks so results finalize (the ts-equal
      // click/error pair for user 3 joins too: bound is inclusive)
      input.addData(ev(9, "2024-01-01 15:00:00", 3), ev(10, "2024-01-01 15:00:00", 3, "error"))
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select("error_id", "click_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((2L, 1L), (10L, 9L)), s"got $rows")
    }
  }

  test("stream-stream join ≡ the oracled batch twin, including out-of-order arrivals") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val q = errorClickJoin(input.toDF())
      .writeStream.format("memory").queryName("ssjparity").outputMode("append").start()
    val all = scala.collection.mutable.ArrayBuffer[Event]()
    def feed(evs: Event*): Unit = { all ++= evs; input.addData(evs: _*); q.processAllAvailable() }
    withQuery(q) {
      // in-order batch: click then error joins
      feed(ev(1, "2024-01-01 10:00:00", 1),
           ev(2, "2024-01-01 10:30:00", 1, "error"))
      // OUT-OF-ORDER: a click with EARLIER event time arrives in a later
      // micro-batch (inside the 1 h watermark horizon) — the buffered
      // error must still pair with it retroactively
      feed(ev(3, "2024-01-01 10:20:00", 1))
      // an error arriving before its (also late) matching click, both
      // within the horizon, different user
      feed(ev(4, "2024-01-01 10:45:00", 2, "error"))
      feed(ev(5, "2024-01-01 10:40:00", 2))
      // advance both watermarks far enough to finalize everything
      feed(ev(8, "2024-01-01 14:00:00", 9),
           ev(9, "2024-01-01 14:00:00", 9, "error"))
      q.processAllAvailable()
      val streamed = spark.table("ssjparity")
        .select("error_id", "click_id").as[(Long, Long)].collect().toSet
      // the oracled batch twin on the SAME rows is the ground truth
      val batch = graft.operators.Events.errorClickPairsOf(all.toSeq.toDF())
        .select("error_id", "click_id").as[(Long, Long)].collect().toSet
      assert(batch == Set((2L, 1L), (2L, 3L), (4L, 5L), (9L, 8L)), s"twin wrong: $batch")
      assert(streamed == batch,
        s"stream ${streamed.toSeq.sorted} != batch ${batch.toSeq.sorted}")
    }
  }

  test("LEFT OUTER stream-stream join: null row waits for watermark expiry, then matches the batch twin") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val q = errorClickJoinOuter(input.toDF())
      .writeStream.format("memory").queryName("ssjouter").outputMode("append").start()
    val all = scala.collection.mutable.ArrayBuffer[Event]()
    def feed(evs: Event*): Unit = { all ++= evs; input.addData(evs: _*); q.processAllAvailable() }
    withQuery(q) {
      feed(ev(1, "2024-01-01 10:00:00", 1),          // click u1
           ev(2, "2024-01-01 10:30:00", 1, "error"), // error u1 — matched
           ev(3, "2024-01-01 10:40:00", 2, "error")) // error u2 — never matched
      // the unmatched error must NOT have emitted its null row yet: the
      // click watermark (10:40 − 1h) has not passed its horizon — a
      // matching click could still legally arrive
      val early = spark.table("ssjouter")
        .select("error_id", "click_id").as[(Long, Option[Long])].collect()
      assert(!early.exists(r => r._1 == 3L && r._2.isEmpty),
        s"null row emitted before watermark expiry: ${early.toSeq}")
      // two watermark-advancing batches: the first moves the click
      // watermark past 11:40 (error 3's horizon), the second runs a
      // trigger UNDER that watermark so the expired state flushes
      feed(ev(8, "2024-01-01 14:00:00", 9), ev(9, "2024-01-01 14:00:00", 9, "error"))
      feed(ev(11, "2024-01-01 16:00:00", 9), ev(12, "2024-01-01 16:00:00", 9, "error"))
      val streamed = spark.table("ssjouter")
        .select("error_id", "click_id").as[(Long, Option[Long])].collect().toSet
      assert(streamed.contains((3L, None)),
        s"unmatched error's null row missing after watermark expiry: ${streamed.toSeq}")
      // the oracled batch twin on the same rows is ground truth for the
      // emitted-so-far prefix (errors 9/12's null-candidacy is resolved:
      // both matched instantly, so every row below is final)
      val batch = graft.operators.Events.errorClickPairsOuterOf(all.toSeq.toDF())
        .select("error_id", "click_id").as[(Long, Option[Long])].collect().toSet
      assert(batch == Set((2L, Some(1L)), (3L, None), (9L, Some(8L)), (12L, Some(11L))),
        s"twin wrong: $batch")
      assert(streamed == batch,
        s"stream ${streamed.toSeq.sortBy(_._1)} != batch ${batch.toSeq.sortBy(_._1)}")
    }
  }

  test("streaming session windows match the batch session query on the same rows") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val rows = Seq(
      ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:20:00", 1),
      ev(3, "2024-01-01 11:30:00", 1), ev(4, "2024-01-01 10:05:00", 2))
    val q = sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("sessw").outputMode("complete").start()
    withQuery(q) {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("sessw")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(streamed == Set(
        (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:50:00"), 2L),
        (1L, ts("2024-01-01 11:30:00"), ts("2024-01-01 12:00:00"), 1L),
        (2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:35:00"), 1L)))
    }
  }
  test("stateful funnel: progression emits on step changes; final state matches the batch funnel") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    // u1 completes the funnel across two batches; u2 clicks before
    // viewing (the click must not count); u3 only views.
    val batch1 = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view"),
      ev(2, "2024-01-01 10:05:00", 1, "click"),
      ev(3, "2024-01-01 09:00:00", 2, "click"),
      ev(4, "2024-01-01 09:30:00", 2, "view"),
      ev(5, "2024-01-01 11:00:00", 3, "view"))
    val batch2 = Seq(
      ev(6, "2024-01-01 10:10:00", 1, "purchase"),
      ev(7, "2024-01-01 09:45:00", 2, "click")) // click AFTER u2's view: advances
    val q = funnelStateful(input.toDS())
      .writeStream.format("memory").queryName("funnelst").outputMode("update").start()
    withQuery(q) {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // last emitted row per user = final state
      val finalSteps = spark.table("funnelst")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("step").as("step"))
        .as[(Long, Int)].collect().toMap
      assert(finalSteps === Map(1L -> 3, 2L -> 2, 3L -> 1))
      // batch twin on the union of both batches agrees on the step counts
      import spark.implicits._
      val batchDf = (batch1 ++ batch2).toDF()
      val counts = graft.operators.Events.funnelOf(batchDf).collect()
        .map(r => r.getInt(0) -> r.getLong(2)).toMap
      val streamCounts = (1 to 3).map(st =>
        st -> finalSteps.values.count(_ >= st).toLong).toMap
      assert(counts === streamCounts,
        s"stream final states must reproduce the batch funnel: $counts vs $streamCounts")
    }
  }

  test("stateful funnel: a late step-2 arriving after step-3 still yields batch parity") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    // u1's click is DELAYED: the purchase (step 3) arrives in batch 1,
    // the click (step 2) only in batch 2, with an event time BETWEEN
    // view and purchase and inside the 30-minute watermark horizon.
    // The pre-round-12 monotone machine pinned t2 to nothing (click
    // rejected: no t2 ordering) and could never unlock step 3 —
    // the buffered replay must slot it in and reach the batch answer.
    val batch1 = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view"),
      ev(2, "2024-01-01 10:20:00", 1, "purchase"))
    val batch2 = Seq(
      ev(3, "2024-01-01 10:10:00", 1, "click"), // the straggler
      ev(4, "2024-01-01 10:25:00", 2, "view"))  // advances u2 + the clock
    val q = funnelStateful(input.toDS())
      .writeStream.format("memory").queryName("funnelooo").outputMode("update").start()
    withQuery(q) {
      input.addData(batch1: _*)
      q.processAllAvailable()
      // provisional after batch 1: view only (a purchase with no
      // prior click does not advance past step 1)
      val after1 = spark.table("funnelooo")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("step").as("step"))
        .as[(Long, Int)].collect().toMap
      assert(after1 === Map(1L -> 1))
      input.addData(batch2: _*)
      q.processAllAvailable()
      val finalSteps = spark.table("funnelooo")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("step").as("step"))
        .as[(Long, Int)].collect().toMap
      import spark.implicits._
      val counts = graft.operators.Events.funnelOf((batch1 ++ batch2).toDF())
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      val streamCounts = (1 to 3).map(st =>
        st -> finalSteps.values.count(_ >= st).toLong).toMap
      assert(finalSteps === Map(1L -> 3, 2L -> 1),
        s"late click must retro-unlock the purchase: $finalSteps")
      assert(counts === streamCounts,
        s"stream must reproduce the batch funnel: $counts vs $streamCounts")
    }
  }

  test("stateful twins under the RocksDB state store: funnel + EWMA parity unchanged") {
    // the default in-memory (HDFS-backed) provider holds every user's
    // state on the executor heap — at 100× user cardinality the
    // RocksDB provider is the production posture. The provider is a
    // pure storage swap, so the twins must produce byte-identical
    // progressions; this pin runs the HARD paths (out-of-order funnel
    // straggler + EWMA re-ordering) under RocksDB.
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val batch1 = Seq(
        ev(1, "2024-01-01 10:00:00", 1, "view"),
        ev(2, "2024-01-01 10:20:00", 1, "purchase"))
      val batch2 = Seq(
        ev(3, "2024-01-01 10:10:00", 1, "click"), // the straggler
        ev(4, "2024-01-01 10:25:00", 2, "view"))
      val q = funnelStateful(input.toDS())
        .writeStream.format("memory").queryName("funnelrdb").outputMode("update").start()
      withQuery(q) {
        input.addData(batch1: _*)
        q.processAllAvailable()
        input.addData(batch2: _*)
        q.processAllAvailable()
        val finalSteps = spark.table("funnelrdb")
          .groupBy("user_id").agg(org.apache.spark.sql.functions.max("step").as("step"))
          .as[(Long, Int)].collect().toMap
        assert(finalSteps === Map(1L -> 3, 2L -> 1),
          s"RocksDB-backed funnel diverged: $finalSteps")
      }
      val einput = MemoryStream[Event]
      val eb1 = Seq(
        ev(1, "2024-01-01 10:00:00", 1, v = 10.0),
        ev(3, "2024-01-01 10:10:00", 1, v = 30.0))
      val eb2 = Seq(ev(2, "2024-01-01 10:05:00", 1, v = 20.0))
      val eq = EventStreams.ewmaStateful(einput.toDS())
        .writeStream.format("memory").queryName("ewmardb").outputMode("update").start()
      withQuery(eq) {
        einput.addData(eb1: _*)
        eq.processAllAvailable()
        einput.addData(eb2: _*)
        eq.processAllAvailable()
        val last = spark.table("ewmardb").as[UserEwma].collect()
          .filter(_.user_id == 1L)
          .maxBy(r => (r.last_ts.getTime, r.n_window))
        val batchRow = graft.operators.Events
          .ewmaLatestOf((eb1 ++ eb2).toDF()).collect()
          .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
          .find(_._1 == 1L).get
        assert(last.ewma === batchRow._4 && last.n_window.toLong === batchRow._3,
          s"RocksDB-backed EWMA diverged: ${last.ewma} vs ${batchRow._4}")
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stateful EWMA: a late mid-window value slots into event-time order (batch parity)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    // u1's middle reading is DELAYED to batch 2: the trailing window
    // must order [10, 20, 30] by event time, not [10, 30, 20] by
    // arrival — the weighted average differs between the two
    val batch1 = Seq(
      ev(1, "2024-01-01 10:00:00", 1, v = 10.0),
      ev(3, "2024-01-01 10:10:00", 1, v = 30.0))
    val batch2 = Seq(
      ev(2, "2024-01-01 10:05:00", 1, v = 20.0)) // the straggler
    val q = EventStreams.ewmaStateful(input.toDS())
      .writeStream.format("memory").queryName("ewmaooo").outputMode("update").start()
    withQuery(q) {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val last = spark.table("ewmaooo").as[UserEwma].collect()
        .filter(_.user_id == 1L)
        .maxBy(r => (r.last_ts.getTime, r.n_window))
      val batchRow = graft.operators.Events
        .ewmaLatestOf((batch1 ++ batch2).toDF()).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .find(_._1 == 1L).get
      assert(last.last_ts === batchRow._2)
      assert(last.n_window.toLong === batchRow._3)
      assert(last.ewma === batchRow._4,
        s"stream ewma ${last.ewma} != batch ${batchRow._4} — straggler not re-ordered")
    }
  }

  test("stateful EWMA: incremental trailing window equals the batch query exactly") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    // u1 gets 25 events across two batches (window must trim to 20);
    // u2 has 3 — varied values so the weighting is actually exercised
    val batch1 = (1 to 15).map(i =>
      ev(i, f"2024-01-01 10:$i%02d:00", 1, v = i * 1.7 - 8.0)) ++
      Seq(ev(100, "2024-01-01 09:00:00", 2, v = 5.5))
    val batch2 = (16 to 25).map(i =>
      ev(i, f"2024-01-01 11:${i - 15}%02d:00", 1, v = 60.0 - i * 2.3)) ++
      Seq(ev(101, "2024-01-01 09:30:00", 2, v = -2.25),
        ev(102, "2024-01-01 09:45:00", 2, v = 0.125))
    val q = EventStreams.ewmaStateful(input.toDS())
      .writeStream.format("memory").queryName("ewmast").outputMode("update").start()
    withQuery(q) {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // last emitted row per user (max last_ts) = the final feature
      val out = spark.table("ewmast").as[UserEwma].collect()
        .groupBy(_.user_id).map { case (u, rows) =>
          u -> rows.maxBy(r => (r.last_ts.getTime, r.n_window))
        }
      val batchRows = graft.operators.Events
        .ewmaLatestOf((batch1 ++ batch2).toDF())
        .collect()
        .map(r => r.getLong(0) ->
          (r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toMap
      assert(batchRows.keySet === out.keySet)
      for ((u, s) <- out) {
        val (bts, bn, bewma) = batchRows(u)
        assert(s.last_ts === bts, s"user $u last_ts")
        assert(s.n_window.toLong === bn, s"user $u n_window")
        assert(s.ewma === bewma,
          s"user $u: stream ewma ${s.ewma} != batch $bewma (exact parity required)")
      }
      // the trim actually happened: u1's window is capped at 20
      assert(out(1L).n_window === 20)
    }
  }
}
