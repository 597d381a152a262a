package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Advisory maintenance lease for an index-artifact directory — the
  * lock object PLANS.md's concurrency contract called for once more
  * than one maintainer can exist.
  *
  * The artifacts' own layout already makes the cheap races safe
  * (keyed appends write disjoint `batch_id=` directories; compaction
  * swaps via rename with a complete copy at every instant). What the
  * layout cannot express is the one genuinely destructive overlap:
  * an EXCLUSIVE job (writeIndexes rewrite, compactIndexes fold) and
  * a concurrent appender — a keyed append landing between
  * compaction's read and its swap is folded away or half-kept. This
  * object serializes exactly that, and nothing more:
  *
  *  - exclusive maintainers hold `<indexDir>/.maintenance.lease`;
  *  - appender-class jobs (keyed/bare appends, the deferred pair
  *    rebuild) each hold their own `.append-<tag>-<nonce>.lease`
  *    marker — appenders never block each other, preserving the
  *    pinned two-racing-appenders behavior;
  *  - readers take nothing: a primed session's protection remains
  *    the fail-loud FileNotFound + re-prime contract.
  *
  * Mutual exclusion comes from ORDER, not from waiting: an exclusive
  * claimant creates its lease file first (create-exclusive — atomic
  * on local fs and HDFS) and THEN checks for live appender markers;
  * an appender creates its marker first and THEN re-checks for the
  * lease. If both proceeded, the appender's re-check saw no lease, so
  * the lease was created after the marker — and the exclusive check,
  * later still, must have seen that marker and aborted: contradiction.
  * Both sides fail FAST on conflict (schedulers retry; nothing spins
  * holding cluster resources). Requires read-after-write listing
  * consistency (local fs, HDFS, and current S3 give this; an
  * eventually-consistent store would need a real lock service).
  *
  * Crash recovery is TTL-based: a lease or marker whose modification
  * time is older than `DefaultTtlMs` belonged to a crashed owner and
  * is reaped — by atomic RENAME to a tombstone first, so when two
  * claimants race to reap the same stale file exactly one rename
  * succeeds and the loser backs off; a reaper can never delete a
  * FRESH lease some third party just created (the delete-after-read
  * hazard a plain delete would have). The TTL (30 min) is generous
  * against the longest observed maintenance job (writeIndexes 393 s
  * at the 10× tier); a legitimately longer job should re-touch its
  * lease file or raise the ttl parameter. */
object IndexLease {

  /** A lease/marker older than this is a crashed owner's leftover. */
  val DefaultTtlMs: Long = 30L * 60 * 1000

  private def leasePath(indexDir: String) =
    new Path(s"$indexDir/.maintenance.lease")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Create-exclusive with owner provenance in the content (for error
    * messages and operator forensics; staleness is judged from the
    * file's mtime, which exists even if a crash truncated the write). */
  private def createExclusive(fs: FileSystem, p: Path, owner: String): Boolean =
    try {
      val out = fs.create(p, false)
      try out.write(s"$owner @ ${System.currentTimeMillis()}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }

  private def ownerOf(fs: FileSystem, p: Path): String =
    try {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](256)
        val n = math.max(in.read(buf), 0)
        new String(buf, 0, n, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    } catch { case _: java.io.IOException => "<unreadable>" }

  /** Reap `p` if stale: rename-to-tombstone (exactly one racer wins),
    * then delete the tombstone. Fresh files are left alone. */
  private def reapIfStale(fs: FileSystem, p: Path, ttlMs: Long): Unit = {
    val stale =
      try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > ttlMs
      catch { case _: java.io.IOException => false } // vanished/absent: nothing to reap
    if (stale) {
      val tomb = new Path(p.getParent, s"${p.getName}.reaped-${System.nanoTime()}")
      if (fs.rename(p, tomb)) fs.delete(tomb, false)
    }
  }

  private def appenderMarkers(fs: FileSystem, indexDir: String): Seq[Path] = {
    val dir = new Path(indexDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(".append-")
        && s.getPath.getName.endsWith(".lease"))
      .map(_.getPath)
  }

  /** Run `body` as the single exclusive maintainer of `indexDir`.
    * Throws IllegalStateException without running `body` if another
    * exclusive job holds the lease or any appender is live. The lease
    * is released on every exit path. */
  def withExclusive[T](spark: SparkSession, indexDir: String, owner: String,
                       ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val lease = leasePath(indexDir)
    val fs = fsOf(spark, lease)
    reapIfStale(fs, lease, ttlMs)
    if (!createExclusive(fs, lease, owner))
      throw new IllegalStateException(
        s"IndexLease: exclusive maintenance on $indexDir already held by " +
          s"'${ownerOf(fs, lease)}' — serialize maintenance jobs, or if the " +
          s"holder crashed wait out the ${ttlMs / 1000} s TTL")
    try {
      // lease first, THEN the marker check — the ordering the
      // mutual-exclusion argument in the scaladoc rests on
      appenderMarkers(fs, indexDir).foreach(reapIfStale(fs, _, ttlMs))
      val live = appenderMarkers(fs, indexDir)
      if (live.nonEmpty)
        throw new IllegalStateException(
          s"IndexLease: ${live.size} live appender(s) on $indexDir " +
            s"(${live.map(_.getName).mkString(", ")}) — an exclusive job " +
            "folding a mid-flight append would lose or half-keep its rows; " +
            "retry after the appends finish")
      body
    } finally fs.delete(lease, false)
  }

  /** Run `body` holding an appender-class marker on `indexDir`:
    * excluded from exclusive maintenance, concurrent with other
    * appenders. Throws IllegalStateException if an exclusive job holds
    * the lease. The marker is released on every exit path. */
  def withShared[T](spark: SparkSession, indexDir: String, tag: String,
                    ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val lease = leasePath(indexDir)
    val fs = fsOf(spark, lease)
    reapIfStale(fs, lease, ttlMs)
    def failHeld(): Nothing = throw new IllegalStateException(
      s"IndexLease: exclusive maintenance in progress on $indexDir " +
        s"(held by '${ownerOf(fs, lease)}') — appends must wait for it")
    if (fs.exists(lease)) failHeld()
    val safeTag = tag.replaceAll("[^A-Za-z0-9._-]", "_")
    val marker = new Path(s"$indexDir/.append-$safeTag-${System.nanoTime()}.lease")
    require(createExclusive(fs, marker, tag), s"IndexLease: marker $marker collision")
    try {
      // marker first, THEN the lease re-check (see withExclusive)
      if (fs.exists(lease)) failHeld()
      body
    } finally fs.delete(marker, false)
  }
}
