package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Continuous-ingest exact dedup: the streaming complement to the
  * batch dedup family (`Dedup.exactDedup` for within-corpus,
  * `Dedup.incrementalNearDups` for batch-vs-corpus). A document
  * stream is deduped in two tiers:
  *
  *  1. WITHIN the stream — `dropDuplicatesWithinWatermark` on the
  *     normalized-text fingerprint, so replayed/re-crawled documents
  *     collapse while state stays bounded by the watermark (the
  *     at-scale requirement: an unbounded `dropDuplicates` keeps
  *     every fingerprint ever seen in the state store).
  *  2. AGAINST the standing corpus — a stream-static left join on the
  *     corpus fingerprint table. The static side is re-resolved per
  *     micro-batch, so a corpus refresh (new parquet snapshot) is
  *     picked up without restarting the query; at 100 TB the
  *     fingerprint artifact is 32 hex chars per distinct document,
  *     not the documents themselves, and the join broadcasts or
  *     shuffles by AQE/stats exactly like its batch twin.
  *
  * Both tiers hash with `Dedup.normText` so the stream-side
  * fingerprints are byte-identical to every batch operator's.
  * IngestDedupSpec pins the two-tier semantics and stream/batch
  * fingerprint parity.
  */
object IngestDedup {

  /** Static side: distinct fingerprints of the standing corpus — the
    * persistable dedup index artifact (see Dedup.writeIndexes for the
    * batch family's equivalents). */
  def corpusFingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(md5(Dedup.normText(col("text"))).as("fp"))
      .distinct()

  /** Streaming ingest dedup over a (ts, doc_id, text) stream: emits
    * one row per first-seen-within-watermark fingerprint with an
    * `in_corpus` flag — downstream sinks route novel documents into
    * the corpus and drop/audit the duplicates. Append-mode safe:
    * stream-static left join with the stream on the left. */
  def dedupIngest(docs: DataFrame, corpusFp: DataFrame,
                  watermark: String = "1 hour"): DataFrame =
    docs.withColumn("fp", md5(Dedup.normText(col("text"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .join(corpusFp.withColumn("hit", lit(1)), Seq("fp"), "left")
      .select(col("doc_id"), col("ts"), col("fp"),
        col("hit").isNotNull.as("in_corpus"))
}
