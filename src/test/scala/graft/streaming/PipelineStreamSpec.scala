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
}
