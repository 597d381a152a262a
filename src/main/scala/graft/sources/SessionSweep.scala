package graft.sources

import org.apache.spark.sql.SparkSession

/** Session-scoped cache hygiene for the driver-side memo maps.
  *
  * Every library cache keyed by a session (table loads, index memos,
  * fitted models, derived caps) prefixes its keys with the session's
  * UUID from [[key]]. The UUID map itself is weak, but the prefixed
  * ENTRIES used to outlive their session — irrelevant for a bench
  * JVM, a slow driver leak in a long-lived multi-session server
  * (the r19 verdict's "unbounded memo growth" item).
  *
  * Mechanism: each session's UUID rides a WeakReference registered
  * with a ReferenceQueue; [[sweep]] (called on every [[key]] lookup —
  * i.e. on any cache access) drains collected sessions and removes
  * their `uuid|`-prefixed entries from every [[scoped]] map. Dropping
  * the entries releases the cached DataFrames, which in turn lets
  * Spark's ContextCleaner reclaim their checkpoint blocks.
  */
private[graft] object SessionSweep {
  private val refQueue = new java.lang.ref.ReferenceQueue[SparkSession]()
  private final class Tag(s: SparkSession, val key: String)
    extends java.lang.ref.WeakReference[SparkSession](s, refQueue)
  private val keys = new java.util.WeakHashMap[SparkSession, String]()
  // Tags must stay strongly reachable until polled, or the GC may
  // reclaim the WeakReference itself without ever enqueueing it
  private val tags =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Tag]()
  private val scopedMaps =
    new java.util.concurrent.CopyOnWriteArrayList[java.util.concurrent.ConcurrentHashMap[String, _]]()

  /** Register a cache whose keys are `"<session-uuid>|..."` for
    * dead-session eviction; returns it for inline declaration. */
  def scoped[V](m: java.util.concurrent.ConcurrentHashMap[String, V])
      : java.util.concurrent.ConcurrentHashMap[String, V] = {
    scopedMaps.add(m)
    m
  }

  /** Stable per-session UUID (weak — a dropped session's entry is
    * collectable). identityHashCode carries no uniqueness guarantee,
    * so two concurrently live sessions could in principle collide on
    * it; the UUID cannot. */
  def key(spark: SparkSession): String = {
    sweep()
    keys.synchronized {
      var k = keys.get(spark)
      if (k == null) {
        k = java.util.UUID.randomUUID().toString
        keys.put(spark, k)
        tags.add(new Tag(spark, k))
      }
      k
    }
  }

  /** Drain collected sessions; purge their entries from every scoped
    * map. Cheap when nothing died (one volatile poll). */
  def sweep(): Unit = {
    var r = refQueue.poll()
    while (r != null) {
      val t = r.asInstanceOf[Tag]
      tags.remove(t)
      val prefix = t.key + "|"
      scopedMaps.forEach(m => m.keySet.removeIf(_.startsWith(prefix)))
      r = refQueue.poll()
    }
  }

  /** Test hook: total entries across scoped maps carrying `prefix`. */
  private[graft] def entriesFor(uuid: String): Int = {
    val prefix = uuid + "|"
    var n = 0
    scopedMaps.forEach { m =>
      m.keySet.forEach(k => if (k.startsWith(prefix)) n += 1)
    }
    n
  }
}
