package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Streaming ANN serving: answer a stream of query VECTORS with their
  * top-k corpus neighbors off the persisted LSH bucket artifact — the
  * online-retrieval complement to the batch annLsh family (which
  * serves queries drawn from the corpus) and to IngestDedup's
  * embNearDupIngest (which FLAGS near-dups instead of ranking
  * neighbors).
  *
  * Shape: `foreachBatch`, the established refreshable-static-side
  * pattern (QualityGate / dedupIngestForeachBatch) — per-query
  * scoring is a bucket probe + candidate join + windowed rerank,
  * which inside the streaming plan would need stateful aggregation
  * for state the query never reuses (every query vector is answered
  * completely within its micro-batch). The bucket/vector artifacts
  * are resolved through the session memo per batch, so an index
  * refresh (appendIndexes landing new corpus vectors) is served on
  * the next batch without restarting the stream.
  *
  * Parity (AnnServeSpec): a streamed query vector equal to a corpus
  * vector's embedding returns that corpus vector as its top-1 at
  * cosine 1, and the streamed result is row-identical to calling the
  * batch kernel [[Similarity.annServeBatch]] on the same rows. */
object AnnServe {

  /** Serve a (ts, query_id, embedding) stream: each micro-batch's
    * top-k neighbor table is handed to `sink` as
    * (query_id, neighbor_id, cos, rn). `radius` is the Hamming probe
    * recall knob (query-side only). Pass `checkpointDir` in any
    * deployment that must survive a restart (the IngestDedup
    * contract: a throwaway temp checkpoint replays old offsets). */
  def annServeIngest(queries: DataFrame, spark: SparkSession, dir: String,
      k: Int = 5, radius: Int = 1, checkpointDir: Option[String] = None)
      (sink: DataFrame => Unit): StreamingQuery = {
    val w = queries.writeStream
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(Similarity.annServeBatch(spark, dir,
        batch.select("query_id", "embedding"), k, radius))
    }.start()
  }

  /** [[annServeIngest]] against the fitted-IVF index family instead of
    * the LSH planes: probes use the persisted recall-tuned budget
    * (`ivfProbeTuned`), so streamed traffic serves at the audited
    * recall. Same per-batch artifact resolution — an index refresh
    * lands on the next micro-batch without a stream restart. */
  def annServeIngestIvf(queries: DataFrame, spark: SparkSession, dir: String,
      k: Int = 5, checkpointDir: Option[String] = None)
      (sink: DataFrame => Unit): StreamingQuery = {
    val w = queries.writeStream
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(Similarity.annServeBatchIvf(spark, dir,
        batch.select("query_id", "embedding"), k))
    }.start()
  }

  /** The compressed-domain serving twin ([[Similarity
    * .annServeBatchIvfPq]]): IVF probe + PQ-ADC shortlist + exact
    * rerank per micro-batch, every stage on persisted artifacts and
    * tuned budgets — the family a billion-vector deployment streams
    * against, since candidate float fetches are shortlist-sized
    * rather than probe-sized. */
  def annServeIngestIvfPq(queries: DataFrame, spark: SparkSession, dir: String,
      k: Int = 5, checkpointDir: Option[String] = None)
      (sink: DataFrame => Unit): StreamingQuery = {
    val w = queries.writeStream
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(Similarity.annServeBatchIvfPq(spark, dir,
        batch.select("query_id", "embedding"), k))
    }.start()
  }
}
