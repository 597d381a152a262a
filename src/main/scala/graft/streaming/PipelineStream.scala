package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Pipeline

/** Continuous-ingest CURATION: the streaming face of the incremental
  * pipeline window (`Pipeline.pipelineE2eSince`) — each ingest
  * micro-batch is accounted against the maintained corpus-global
  * artifacts and emits its own lineage rows, the production cadence
  * the round-16 100× probe simulated (500-doc warm delta ≈ 0.25% of a
  * full-pipeline run).
  *
  * Shape: `foreachBatch` (the refreshable-static-side discipline every
  * serving stream here uses — the corpus-global stage verdicts are
  * session-memoized batch plans, re-read from the maintained parquet
  * artifacts, not streaming state). The stream carries newly ingested
  * doc ids; a driver-held watermark turns each batch into the window
  * (last_hi, batch_max]: the id-window contract pipelineE2eSince and
  * the batch `q_pipeline_incremental` query already oracle. Ingest ids
  * are monotone by the corpus's append discipline (the vec_id /
  * batch-id uniqueness rule), so consecutive batches tile the id axis
  * exactly like consecutive manual window calls — PipelineStreamSpec
  * pins two micro-batches ≡ two sequential pipelineE2eSince windows.
  *
  * Pass `checkpointDir` in any deployment that must survive a restart
  * (and persist the watermark next to it — `initialLo` re-seeds it;
  * the batch twin stores marks in `sources.WatermarkStore`): a
  * throwaway temp checkpoint replays old offsets on restart and those
  * windows would be re-accounted. */
object PipelineStream {

  /** Start the per-window lineage stream. `ingest` is a streaming
    * DataFrame with a `doc_id` column (the ids the ingest landed this
    * batch); `land` receives each window's lineage rows tagged with
    * (win_lo, win_hi, batch_id). Empty micro-batches advance nothing
    * and emit nothing. */
  def lineageStream(spark: SparkSession, dir: String, ingest: DataFrame,
      initialLo: Long, checkpointDir: Option[String] = None)
      (land: DataFrame => Unit): StreamingQuery = {
    val lastHi = new java.util.concurrent.atomic.AtomicLong(initialLo)
    val writer = ingest.writeStream.outputMode("append")
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.foreachBatch { (batch: DataFrame, id: Long) =>
      val agg = batch.agg(max(col("doc_id"))).first()
      if (!agg.isNullAt(0)) {
        val hi = agg.getLong(0)
        val lo = lastHi.get()
        if (hi > lo) {
          val rows = Pipeline.pipelineE2eSince(spark, dir, lo, hi)
            .withColumn("win_lo", lit(lo))
            .withColumn("win_hi", lit(hi))
            .withColumn("batch_id", lit(id))
          land(rows)
          lastHi.set(hi)
        }
      }
    }.start()
  }
}
