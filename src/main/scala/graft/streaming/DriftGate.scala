package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{EmbeddingOps, Similarity, SimilarityIvf}

/** Streaming drift gate: score an embedding ingest stream's PSI
  * against the maintained corpus, micro-batch by micro-batch — the
  * online form of [[graft.operators.EmbeddingOps.embeddingDrift]].
  * The monitor a recurring crawl runs DURING ingest instead of after:
  * a batch whose cell-occupancy histogram no longer matches the corpus
  * (new content domain, upstream encoder change, a crawler stuck on
  * one site) trips the gate before the batch is appended and the
  * index geometry rots.
  *
  * Shape: `foreachBatch`, the refreshable-static-side pattern
  * (IngestDedup / QualityGate discipline) — PSI needs the batch's
  * WHOLE histogram against the corpus's, so each micro-batch scores
  * batch-locally and completely; inside the streaming plan this would
  * be a stateful aggregation holding state the query never needs. The
  * reference side (the fitted quantizer + the corpus cell index) is
  * memo/artifact-resolved per batch, so writeIndexes/appendIndexes
  * refreshes are picked up on the next batch without a restart.
  *
  * Assignment parity: the batch is assigned with the SAME frozen
  * fitted quantizer ([[SimilarityIvf.ivfAssign]]) the corpus index
  * was built under — one cell geometry on both sides, the invariant
  * that makes the histograms comparable at all.
  *
  * 100 TB posture: per-batch cost is a batch-sized assignment scan +
  * one K-row join against the (maintained, K-row) corpus histogram —
  * no corpus read on the hot path beyond the ids-only index's
  * occupancy aggregate, which a deployment keeps as table statistics.
  */
object DriftGate {

  /** PSI report of one (vec_id, embedding) slice against the corpus —
    * the batch kernel. Reference = the maintained fitted-cell index's
    * occupancy; current = `batch` assigned under the same quantizer.
    * Cells empty on one side survive the full join (smoothed by the
    * shared kernel), so a batch concentrated in a single cell reads as
    * the drift it is. */
  def driftReport(batch: DataFrame, spark: SparkSession, dir: String): DataFrame = {
    val cents = SimilarityIvf.fitCentroids(spark, dir)
    val ref = SimilarityIvf.ivfCells(spark, dir, cents, s"ivfCellsFit|$dir")
      .groupBy("cell").agg(count(lit(1)).as("n_ref"))
    val cur = SimilarityIvf.ivfAssign(Similarity.embBaseOf(batch), cents)
      .groupBy("cell").agg(count(lit(1)).as("n_cur"))
    val cnt = ref.join(cur, Seq("cell"), "full")
      .select(col("cell"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    EmbeddingOps.psiReport(cnt, cents.length)
  }

  /** Gate a (vec_id, embedding) ingest stream: each micro-batch's PSI
    * report goes to `sink` with the batch id attached — admission
    * (append, quarantine, alert) is the sink's call, typically on
    * `psi_total` against a deployment threshold (the 0.1 / 0.25
    * monitor-industry convention for moderate / major shift). */
  def driftGateIngest(vecs: DataFrame, spark: SparkSession, dir: String,
      checkpointDir: Option[String] = None)
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = vecs.writeStream
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, id: Long) =>
      // an EMPTY batch (recovery replay, no-data trigger) must not
      // reach the sink: with n_cur = 0 everywhere the smoothed current
      // shares go uniform while the reference stays skewed, and the
      // "drift" of no data at all reads as a large spurious PSI
      if (!batch.isEmpty) sink(driftReport(batch, spark, dir), id)
    }.start()
  }
}
