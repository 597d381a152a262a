package graft.sources

import graft.SparkSpec

/** Dead-session cache hygiene (the r19 "unbounded memo growth" item):
  * the table-load cache must not pin its session (it lives ON the
  * session and dies with it), and scoped driver memos (caps, knobs,
  * fingerprints) must purge once their session is collected. */
class SessionSweepSpec extends SparkSpec {

  private def gcUntil(cond: => Boolean): Boolean = {
    var tries = 0
    while (!cond && tries < 50) {
      System.gc()
      Thread.sleep(50)
      SessionSweep.sweep()
      tries += 1
    }
    cond
  }

  test("the bounded load cache evicts and un-pins a dropped session") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sweep").toString
    for (n <- Seq("orders") ++ (1 to 70).map(i => s"t$i"))
      spark.range(5).selectExpr("id", "id * 2 AS v")
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    var weak: java.lang.ref.WeakReference[org.apache.spark.sql.SparkSession] = null
    var uuid: String = null
    locally {
      var s = spark.newSession()
      Tables.load(s, dir, "orders") // resolution only — populates the cache
      assert(Tables.loadCacheSizeForTest(s) == 1)
      Tables.load(s, dir, "orders")
      assert(Tables.loadCacheSizeForTest(s) == 1, "second load must hit the cache")
      uuid = SessionSweep.key(s)
      weak = new java.lang.ref.WeakReference(s)
      s = null
      org.apache.spark.sql.SparkSession.clearActiveSession()
    }
    // 70 fresh loads on the live session push the dropped session's
    // entry past the FIFO bound; eviction removes the last strong path
    // to that session, GC collects it, and the sweep purges leftovers
    (1 to 70).foreach(i => Tables.load(spark, dir, s"t$i"))
    assert(gcUntil(weak.get() == null),
      "a dropped session whose load-cache entry was evicted was never " +
        "collected — something else static pins it")
    assert(gcUntil(SessionSweep.entriesFor(uuid) == 0))
  }

  test("a collected session's scoped-cache entries are purged") {
    val probe = SessionSweep.scoped(
      new java.util.concurrent.ConcurrentHashMap[String, String]())
    var uuid: String = null
    var weak: java.lang.ref.WeakReference[org.apache.spark.sql.SparkSession] = null
    locally {
      var s = spark.newSession()
      uuid = SessionSweep.key(s)
      probe.put(s"$uuid|some-entry", "v")
      assert(SessionSweep.entriesFor(uuid) == 1)
      weak = new java.lang.ref.WeakReference(s)
      s = null
      org.apache.spark.sql.SparkSession.clearActiveSession()
    }
    assert(gcUntil(weak.get() == null && SessionSweep.entriesFor(uuid) == 0),
      s"scoped caches still hold ${SessionSweep.entriesFor(uuid)} entries " +
        "for a dropped session")
    // a live session's entries survive the sweep
    val liveUuid = SessionSweep.key(spark)
    probe.put(s"$liveUuid|live-entry", "v")
    SessionSweep.sweep()
    assert(SessionSweep.entriesFor(liveUuid) >= 1)
  }

  test("two live sessions never share a key prefix") {
    val a = spark.newSession()
    val b = spark.newSession()
    assert(SessionSweep.key(a) != SessionSweep.key(b))
    assert(SessionSweep.key(a) == SessionSweep.key(a))
  }
}
