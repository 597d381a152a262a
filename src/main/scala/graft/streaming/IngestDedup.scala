package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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
  *     corpus fingerprint table. The static side is re-EXECUTED per
  *     micro-batch, but its parquet file listing is captured when the
  *     DataFrame is defined: a corpus snapshot OVERWRITE under a
  *     running query fails it with FILE_NOT_EXIST (probed, pinned in
  *     IngestDedupSpec) — use `dedupIngestForeachBatch`, which
  *     re-reads the corpus table inside foreachBatch, when the corpus
  *     is refreshed while the stream runs. At 100 TB the fingerprint
  *     artifact is 32 hex chars per distinct document, not the
  *     documents themselves, and the join broadcasts or shuffles by
  *     AQE/stats exactly like its batch twin.
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

  /** dedupIngest for a corpus that is REFRESHED while the stream runs:
    * the watermarked within-stream dedup stays in the streaming plan
    * (stateful), and the corpus join moves into foreachBatch, where
    * the fingerprint table is re-created — fresh file listing — every
    * micro-batch. This is the Spark-idiomatic refreshable-static-side
    * pattern: a plain stream-static join pins its file index at query
    * definition and dies with FILE_NOT_EXIST when the snapshot is
    * overwritten under it (probed; IngestDedupSpec pins both
    * behaviors). `sink` receives each joined micro-batch.
    *
    * Pass `checkpointDir` in any deployment that must survive a
    * restart: without it Spark assigns a THROWAWAY temp checkpoint, so
    * a restarted query re-reads old source offsets and loses the
    * within-stream dedup state — already-ingested documents replay.
    * (Tests exercising one process lifetime may omit it.) */
  def dedupIngestForeachBatch(docs: DataFrame, spark: SparkSession, dir: String,
      watermark: String = "1 hour", checkpointDir: Option[String] = None)
      (sink: DataFrame => Unit): StreamingQuery = {
    val writer = docs.withColumn("fp", md5(Dedup.normText(col("text"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        sink(batch
          .join(corpusFingerprints(spark, dir).withColumn("hit", lit(1)), Seq("fp"), "left")
          .select(col("doc_id"), col("ts"), col("fp"),
            col("hit").isNotNull.as("in_corpus")))
      }
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  // ---- Near-duplicate tier -------------------------------------------

  /** Static sides for the near-dup tier: the corpus MinHash signature
    * table and its banded LSH bucket index. Both are persistable via
    * `Dedup.writeIndexes` and servable from parquet via
    * `Dedup.primeIndexes` — at 100 TB the ingest job primes them from
    * the maintained artifacts rather than re-shingling the corpus; the
    * static side is re-resolved each micro-batch, so an index refresh
    * is picked up without restarting the stream. */
  def corpusSignatures(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashSignatures(spark, dir)
  def corpusBands(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashBandTable(spark, dir)

  /** Streaming token accounting over a (ts, doc_id, text) stream: the
    * per-document subword budget numbers a training-data ingest tracks
    * as documents arrive, through the SAME BPE kernel as the batch
    * artifacts — `graft.functions.BpeTokenize` is one stateless
    * codegen expression, so the stream-side count is byte-identical to
    * `TextAnalysis.bpeTokenCount` and to the persisted
    * `curationBpeToks` artifact by construction (a stream that counted
    * whitespace words while the batch side budgeted BPE subwords would
    * silently drift every ingest-time quota). Pass the corpus-LEARNED
    * merge table to account under the fitted tokenizer
    * (`BpeFit.fitMerges`) — same discipline, different constant.
    * Stateless projection: append-safe at any watermark, no state
    * store. IngestDedupSpec pins stream ≡ batch row-for-row. */
  def tokenAccounting(docs: DataFrame,
                      learnedMerges: Option[Seq[(String, String)]] = None): DataFrame = {
    val toks = learnedMerges match {
      case Some(m) => graft.functions.BpeTokenizeLearnedColumn(col("text"), m)
      case None => graft.functions.BpeTokenizeColumn(col("text"))
    }
    docs
      .select(col("doc_id"), col("ts"), length(col("text")).as("n_chars_calc"),
        split(trim(lower(col("text"))), "\\s+").as("ws"), toks.as("toks"))
      .select(col("doc_id"), col("ts"),
        size(col("ws")).cast("long").as("ws_tokens"),
        size(col("toks")).cast("long").as("bpe_tokens"),
        round(col("n_chars_calc").cast("double") /
          greatest(size(col("toks")), lit(1)), 6).as("chars_per_token"))
  }

  /** Streaming NEAR-dup ingest over a (ts, doc_id, text) stream — the
    * tier the exact-fingerprint path cannot cover: a re-crawled
    * document with one changed sentence has a new md5 but ~0.7+ Jaccard
    * to its corpus twin. Per stream document:
    *
    *  1. MinHash signature via `Dedup.minhashOfText` — byte-identical
    *     to the batch `minhashSignatures` artifact (one expression
    *     tree; a stream cannot checkpoint projection stages).
    *  2. Band explode + stream-static INNER join against the corpus
    *     band-bucket index on (band_idx, band_hash) — the standard LSH
    *     probe, O(matching buckets) not O(corpus).
    *  3. `dropDuplicatesWithinWatermark` on (doc_id, cand_id): a true
    *     near-dup shares many of the 16 bands; collapse the multi-band
    *     hits to one candidate pair with watermark-bounded state.
    *  4. Join the corpus signature table for the candidate's signature
    *     and score est-Jaccard (fraction of agreeing positions) —
    *     emit pairs at or above `minEstJaccard`.
    *
    * Output: (doc_id, ts, cand_id, est_jaccard) — one row per detected
    * (stream doc, corpus doc) near-duplicate. Novel documents emit
    * nothing here; route them via `dedupIngest`'s exact tier. Both
    * joins are stream-static (append-safe, stateless); the only state
    * is the watermarked pair dedup.
    *
    * Cost note: the stream doc's 32-int signature rides each of its 16
    * band rows through the probe join and the pair dedup — a ×16
    * duplication of ~128 B/doc (~2 KB amplification), accepted
    * deliberately: the signature must reach step 4's scorer, and the
    * only way to shed it earlier is re-attaching it after the pair
    * dedup, which would need a stream-STREAM self-join (state-heavy,
    * watermark-coupled) where everything here is stream-static. The
    * batch path's ids-only discipline targets corpus-sized tables;
    * this fan-out is per micro-batch document.
    *
    * Index-refresh note: `Dedup.appendIndexes` only APPENDS files to
    * the signature and band artifacts (it overwrites just the derived
    * pair table, which this stream never reads), so an index append
    * under a running near-dup stream is safe PROVIDED the static sides
    * were primed from parquet (`Dedup.primeIndexes`): a primed table's
    * storage is the file, so the stream's pinned listing keeps serving
    * the pre-append corpus until the query restarts, with no
    * FILE_NOT_EXIST hazard, and appendIndexes' internal releaseIndexes
    * only drops cache entries. With SESSION-BUILT static sides (what
    * un-primed corpusBands/corpusSignatures return — localCheckpoint
    * tables), that same releaseIndexes unpersists their checkpoint
    * blocks mid-stream and the next micro-batch fails with
    * block-not-found (lineage is truncated; nothing to recompute from)
    * — prime before starting the stream, or restart it around the
    * maintenance window. A wholesale `writeIndexes` overwrite is NOT
    * safe under a running stream either way; restart it, or move the
    * probe into foreachBatch (`dedupIngestForeachBatch` pattern).
    *
    * Continuous-maintenance recipe (pinned end-to-end in
    * IngestDedupSpec):
    * {{{
    *   Dedup.primeIndexes(spark, dir, idx)        // file-backed static sides
    *   val q = nearDupIngest(stream,
    *     corpusBands(spark, dir), corpusSignatures(spark, dir))
    *     .writeStream…start()                     // flags near-dups vs corpus
    *   // each maintenance window: route the flagged-novel docs into the
    *   // corpus table, then grow the index without re-shingling:
    *   novelDocs.write.mode("append").parquet(s"$dir/documents.parquet")
    *   Dedup.appendIndexes(spark, dir, idx,
    *     docPredicate = col("doc_id").isin(novelIds: _*),
    *     rebuildPairs = false,                    // pair table deferred
    *     batchId = Some(s"window-$windowId"))     // retried window → no double-append
    *   // (id-ordered corpora can run the whole window as one call:
    *   //  Dedup.ingestSinceWatermark(spark, dir, idx, markPath, maxId)
    *   //  — mark advance and batch key derived together, so the
    *   //  at-least-once retry stays exactly-once in effect)
    *   // the running query keeps serving the pre-append snapshot;
    *   // restart it to probe against the grown index
    * }}} */
  def nearDupIngest(docs: DataFrame, bands: DataFrame, sigs: DataFrame,
                    watermark: String = "1 hour",
                    minEstJaccard: Double = 0.5): DataFrame =
    docs
      .withColumn("sig", Dedup.minhashOfText(col("text")))
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(Dedup.bandHashes(col("sig"))).as(Seq("band_idx", "band_hash")))
      .join(bands.select(col("doc_id").as("cand_id"), col("band_idx"), col("band_hash")),
        Seq("band_idx", "band_hash"))
      // a re-ingested document whose id is already in the index would
      // otherwise flag as a perfect near-dup OF ITSELF (every band
      // collides with its own entry); filtered before the pair dedup
      // so self-pairs never occupy watermark state
      .filter(col("doc_id") =!= col("cand_id"))
      .dropDuplicatesWithinWatermark("doc_id", "cand_id")
      .join(sigs.select(col("doc_id").as("cand_id"), col("sig").as("cand_sig")),
        Seq("cand_id"))
      .select(col("doc_id"), col("ts"), col("cand_id"),
        (size(filter(zip_with(col("sig"), col("cand_sig"), (x, y) => x === y),
          b => b)).cast("double") / Dedup.NumHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)

  /** Streaming EMBEDDING near-dup ingest — the vector-modality twin of
    * `nearDupIngest`, closing the continuous-maintenance story for the
    * ANN family: a (ts, vec_id, embedding) stream is probed against
    * the corpus random-hyperplane bucket index. Per stream vector:
    *
    *  1. Its T bucket strings via `Similarity.bucketStrings` —
    *     byte-identical to the persisted `lshBuckets` artifact (one
    *     expression tree, same seeded hyperplanes).
    *  2. Stream-static INNER join against the corpus bucket index on
    *     (table_idx, bucket) — cost ∝ collisions, O(matching buckets)
    *     not O(corpus).
    *  3. `dropDuplicatesWithinWatermark` on (vec_id, cand_id): a true
    *     near-copy collides in many of the T tables; collapse to one
    *     candidate pair with watermark-bounded state.
    *  4. Exact-cosine rerank against the corpus base table — emit
    *     pairs at or above `minCos`.
    *
    * Output: (vec_id, ts, cand_id, cos). Static sides (`embBase`,
    * `lshBuckets`) are primable from the parquet artifacts
    * (`Dedup.primeIndexes`) and growable under a running stream by
    * `Dedup.appendIndexes` under the same parquet-primed safety
    * condition as the text tier above. Zero-norm stream vectors are
    * dropped (no cosine exists for them), mirroring `embBaseOf`. */
  def embNearDupIngest(vecs: DataFrame, buckets: DataFrame, base: DataFrame,
                       watermark: String = "1 hour",
                       minCos: Double = 0.9): DataFrame = {
    def dot(a: Column, b: Column): Column = graft.functions.ArrayDotProduct(a, b)
    // the stream probe must hash under the CORPUS ARTIFACT's frozen
    // plane count (self-describing: bucket length = h) — plan-build
    // time read of one row off the static side; an empty artifact
    // (nothing to collide with anyway) falls back to the floor
    val h = buckets.select(length(col("bucket"))).limit(1).collect()
      .headOption.map(_.getInt(0))
      .getOrElse(graft.operators.Similarity.NumPlanes)
    vecs
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
      .filter(col("nrm") > 0d)
      .withWatermark("ts", watermark)
      .select(col("vec_id"), col("ts"), col("embedding"), col("nrm"),
        posexplode(graft.operators.Similarity.bucketStrings(col("embedding"), h))
          .as(Seq("table_idx", "bucket")))
      .join(buckets.select(col("vec_id").as("cand_id"), col("table_idx"), col("bucket")),
        Seq("table_idx", "bucket"))
      .filter(col("vec_id") =!= col("cand_id")) // no self-pairs (re-ingested id)
      .dropDuplicatesWithinWatermark("vec_id", "cand_id")
      .join(base.select(col("vec_id").as("cand_id"), col("v").as("v_c"),
        col("nrm").as("nrm_c")), Seq("cand_id"))
      .select(col("vec_id"), col("ts"), col("cand_id"),
        (dot(col("embedding"), col("v_c")) / (col("nrm") * col("nrm_c"))).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Static sides for the embedding tier, memoized/primable like the
    * text tier's. */
  def corpusEmbBase(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.embBase(spark, dir)
  def corpusEmbBuckets(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.lshBuckets(spark, dir)

  /** Streaming SEMANTIC (IVF-cell-blocked) ingest — SemDeDup's
    * maintenance tier, the third blocking scheme in the streaming
    * family: a (ts, vec_id, embedding) stream vector is assigned to
    * its coarse cell via `SimilarityIvf.cellExpr` — the SAME argmax
    * expression tree as the persisted `ivfCells` artifact, so the
    * probe lands in exactly the corpus index's cell geometry — then
    * scored by exact cosine against ONLY its cell-mates (stream-static
    * join on `cell`). Emits (vec_id, ts, dup_of, cos) for mates at or
    * above `minCos`.
    *
    * Cost per stream vector is O(|cell|) — the SemDeDup trade vs the
    * LSH tier's O(collisions): full within-cell recall, no multi-table
    * dependence, with per-cell population as the operational knob
    * `ivfStats` watches (production sizes k ∝ corpus so cells stay
    * bounded). No within-stream pair dedup is needed: one cell per
    * vector means each (new, mate) pair arises exactly once. Static
    * sides (`corpusCells` + `corpusEmbBase`) are primable from the
    * parquet artifacts and growable under a running stream via
    * appendIndexes, same safety condition as the other tiers. */
  def semanticIngest(vecs: DataFrame, cells: DataFrame, base: DataFrame,
                     watermark: String = "1 hour",
                     minCos: Double = 0.9): DataFrame = {
    def dot(a: Column, b: Column): Column = graft.functions.ArrayDotProduct(a, b)
    val cellMates = cells
      .join(base.select(col("vec_id"), col("v"), col("nrm")), Seq("vec_id"))
      .select(col("vec_id").as("dup_of"), col("cell"),
        col("v").as("v_c"), col("nrm").as("nrm_c"))
    vecs
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
      .filter(col("nrm") > 0d)
      .withWatermark("ts", watermark)
      .withColumn("cell",
        graft.operators.SimilarityIvf.cellExpr(col("embedding")))
      .join(cellMates, Seq("cell"))
      .filter(col("vec_id") =!= col("dup_of")) // no self-pairs (re-ingested id)
      .select(col("vec_id"), col("ts"), col("dup_of"),
        (dot(col("embedding"), col("v_c")) / (col("nrm") * col("nrm_c"))).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Static cell index for the semantic tier — the memoized/primable
    * `ivfCells` artifact the batch SemDeDup query rides. */
  def corpusCells(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SimilarityIvf.ivfCells(spark, dir)

}
