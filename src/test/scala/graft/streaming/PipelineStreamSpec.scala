package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, Pipeline}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming face of the incremental pipeline: each ingest
  * micro-batch's lineage accounting must equal the corresponding
  * manual `pipelineE2eSince` window — the driver-contract batch twin
  * (`q_pipeline_incremental`) is the oracle-checked arithmetic, so
  * stream ≡ sequential-windows is the whole remaining surface. */
class PipelineStreamSpec extends SparkSpec {
  import spark.implicits._

  test("two micro-batches equal two sequential pipelineE2eSince windows") {
    val dir = sf("sf0.001")
    def winRows(lo: Long, hi: Long): Seq[Seq[Any]] =
      Pipeline.pipelineE2eSince(spark, dir, lo, hi)
        .collect().map(_.toSeq).toSeq
    val expected1 = winRows(400L, 450L)
    val expected2 = winRows(450L, 500L)

    implicit val sq = spark.sqlContext
    val input = MemoryStream[Long]
    val landed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Seq[Seq[Any]])]
    val q = PipelineStream.lineageStream(spark, dir,
      input.toDF().withColumnRenamed("value", "doc_id"), initialLo = 400L) { rows =>
      val collected = rows.collect()
      val lo = collected.head.getAs[Long]("win_lo")
      val hi = collected.head.getAs[Long]("win_hi")
      landed += ((lo, hi,
        collected.map(_.toSeq.dropRight(3)).toSeq)) // drop win_lo/win_hi/batch_id
    }
    try {
      input.addData(401L to 450L: _*)
      q.processAllAvailable()
      input.addData(451L to 500L: _*)
      q.processAllAvailable()
      // an EMPTY micro-batch must advance nothing and emit nothing
      input.addData(Seq.empty[Long]: _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(landed.size === 2, s"expected 2 landed windows, got ${landed.size}")
    assert(landed(0)._1 === 400L && landed(0)._2 === 450L)
    assert(landed(1)._1 === 450L && landed(1)._2 === 500L)
    assert(landed(0)._3 === expected1,
      "first micro-batch lineage diverges from the manual window")
    assert(landed(1)._3 === expected2,
      "second micro-batch lineage diverges from the manual window")
    Dedup.releaseIndexes(spark)
  }

  test("kill + restart re-seeds the watermark from the store — no window re-accounted") {
    val dir = sf("sf0.001")
    val mark = java.nio.file.Files.createTempDirectory("graft-pstream-wm")
      .resolve("graft-watermark").toString
    implicit val sq = spark.sqlContext
    val landed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def run(feed: Seq[Long]): Unit = {
      // a FRESH MemoryStream per run = the kill: driver memory (the
      // pre-r18 AtomicLong) is gone; only the store survives
      val input = MemoryStream[Long]
      val q = PipelineStream.lineageStream(spark, dir,
        input.toDF().withColumnRenamed("value", "doc_id"),
        initialLo = 400L, watermarkPath = Some(mark)) { rows =>
        val r = rows.select("win_lo", "win_hi").distinct().collect()(0)
        landed += ((r.getLong(0), r.getLong(1)))
      }
      try { input.addData(feed: _*); q.processAllAvailable() } finally q.stop()
    }
    run(401L to 450L)
    assert(landed.toSeq === Seq((400L, 450L)))
    assert(graft.sources.WatermarkStore.read(mark).contains("450"),
      "mark must persist after the window lands")
    // restart with the SAME stale initialLo: the stored 450 wins, so
    // the second run accounts exactly (450, 500] — never (400, 450]
    // again (the pre-r18 in-memory mark would re-account it)
    run(451L to 500L)
    assert(landed.toSeq === Seq((400L, 450L), (450L, 500L)),
      s"restart re-accounted a window: $landed")
    assert(graft.sources.WatermarkStore.read(mark).contains("500"))
    Dedup.releaseIndexes(spark)
  }
}
