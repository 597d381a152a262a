package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Curation, TextAnalysis}

/** Streaming quality gate: score a document ingest stream with the
  * distilled NB quality classifier (`TextAnalysis.nbQualityModel`) —
  * the production use of a distilled filter: the expensive rule
  * evaluation ran ONCE at train time; admission at ingest is a
  * vocabulary join against the maintained model artifact.
  *
  * Shape: `foreachBatch`, the refreshable-static-side pattern
  * `IngestDedup.dedupIngestForeachBatch` established — per-doc scoring
  * is an explode + join + per-doc sum, which inside the streaming plan
  * would be a STATEFUL aggregation (state the query never needs: every
  * document arrives whole in one row, so each micro-batch scores
  * batch-locally and completely). The model table is resolved through
  * the session memo per micro-batch, so an index refresh (writeIndexes
  * / appendIndexes re-derive + re-prime) is picked up on the next
  * batch without restarting the stream.
  *
  * Parity contract (QualityGateSpec): the streamed nb_score is
  * byte-identical to the batch `q_quality_nb` score for the same
  * document — same tokenizer ([[Curation.toks]]), same kernel
  * ([[TextAnalysis.nbScoreSums]]/[[TextAnalysis.nbScoreExpr]]), same
  * DECIMAL discipline. Unknown terms (stream text the train-time vocab
  * never saw) contribute 0, the disclosed batch semantics.
  *
  * 100 TB posture: per-batch cost is batch-sized explode ⋈ vocab-sized
  * model (AQE-broadcast) + a batch-keyed sum — no stream state beyond
  * the source offsets, no corpus-sized reads on the hot path. */
object QualityGate {

  /** Score one (doc_id, text, …) slice against a model table — the
    * batch kernel (every passthrough column of `docs` is preserved;
    * adds nb_score / nb_pred). */
  def scoreBatch(docs: DataFrame, model: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), Curation.toks(col("text")).as("toks"))
    val sums = TextAnalysis.nbScoreSums(toks, model)
    val score = TextAnalysis.nbScoreExpr
    docs.join(sums, Seq("doc_id"), "left")
      .crossJoin(broadcast(TextAnalysis.nbPrior(model)))
      .withColumn("nb_score", score)
      .withColumn("nb_pred", when(score > 0, "pass").otherwise("reject"))
      .drop("sdec", "prior_dec")
  }

  /** Gate a (ts, doc_id, text) ingest stream: each micro-batch is
    * scored against the CURRENT model (memo/artifact-resolved per
    * batch) and handed to `sink` with nb_score/nb_pred attached —
    * downstream routing (admit, quarantine, audit) is the sink's.
    * Pass `checkpointDir` in any deployment that must survive a
    * restart (the IngestDedup contract: a throwaway temp checkpoint
    * replays old offsets on restart). */
  def qualityGateIngest(docs: DataFrame, spark: SparkSession, dir: String,
      checkpointDir: Option[String] = None)
      (sink: DataFrame => Unit): StreamingQuery = {
    val w = docs.writeStream
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(scoreBatch(batch, TextAnalysis.nbQualityModel(spark, dir)))
    }.start()
  }
}
