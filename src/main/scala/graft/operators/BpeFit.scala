package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Bpe, BpeTokenizeLearnedColumn}
import graft.sources.Tables

/** Corpus-LEARNED BPE tokenizer — the production form the fixed
  * [[graft.functions.Bpe.Merges]] table stands in for. The fit follows
  * the train-once model discipline of [[SimilarityIvf.fitCentroids]]:
  *
  *  - the DISTRIBUTED side reduces the corpus to a bounded word-TYPE
  *    frequency table (one explode + hash aggregation + deterministic
  *    top-M — at 100 TB this is the only stage that sees the data, and
  *    it is one shuffle of (word, count) pairs);
  *  - the driver-side loop ([[Bpe.train]]) learns merge ranks over
  *    that histogram alone — the exact shape production BPE trainers
  *    use (Sennrich et al. 2016 train on a word-frequency dict);
  *  - the fitted table persists as the `bpeMergesFit` parquet artifact
  *    (writeIndexes/primeIndexes maintain it alongside the IVF
  *    quantizer), so a fresh session serves the SAME tokenizer the
  *    index job trained — cross-session token accounting can never
  *    drift because a session silently refit;
  *  - serving inlines the learned table into a codegen expression
  *    ([[graft.functions.BpeTokenizeLearned]]) — same kernel, same
  *    plan shape as the fixed-table query;
  *  - the oracle is dynamic (q_knn_ivf_fit discipline): Verify inlines
  *    the FITTED merges into the DuckDB replay at dump time, so
  *    serving under the learned model is hash-checked end to end while
  *    the fit itself is spec-pinned (BpeSpec determinism + planted
  *    -vocabulary cases).
  */
object BpeFit {

  /** Merge count — enough for the synthetic vocabulary to develop
    * multi-character subwords without the driver loop mattering. */
  val NumMerges = 64

  /** Word-type histogram cap: training sees the top-M word types by
    * frequency (ties broken by word — deterministic at any partition
    * count). M bounds the driver state the way the ≤512-row centroid
    * reads do; rare tail types contribute little pair mass and real
    * trainers truncate the same way. */
  val MaxWordTypes = 2048

  /** Cached fitted merges per (session, dir) — the model is a few KB,
    * no eviction discipline needed (cf. SimilarityIvf.fitCache). */
  private val fitCache =
    graft.sources.SessionSweep.scoped(new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]())

  /** Test hook: drop every cached fit (persistence round-trips prove
    * the artifact is served, not the in-process cache). */
  private[operators] def clearFitCache(): Unit = fitCache.clear()

  /** Drop this (session, dir)'s cached fit — called by
    * Dedup.primeIndexes when a persisted merge table is primed: the
    * artifact must win over an in-session fit, or token accounting
    * would diverge from every other session serving the artifact. */
  private[operators] def invalidateFit(spark: SparkSession, dir: String): Unit =
    fitCache.remove(s"${Dedup.sessionKey(spark)}|$dir")

  /** The deterministic word-type histogram the trainer consumes:
    * top-[[MaxWordTypes]] (count desc, word asc). Normalization is
    * byte-identical to the serving kernel's (strip 0x1F, lowercase,
    * split \s+, drop empties). */
  private def wordHistogram(spark: SparkSession, dir: String): Array[(String, Long)] =
    Tables.documents(spark, dir)
      .select(explode(split(lower(translate(col("text"), "", "")),
        "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(MaxWordTypes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

  /** Fitted merge table for `dir` — cache, then persisted artifact,
    * then train (the fitCentroids resolution order). */
  def fitMerges(spark: SparkSession, dir: String): Seq[(String, String)] = {
    val key = s"${Dedup.sessionKey(spark)}|$dir"
    val hit = fitCache.get(key)
    if (hit != null) return hit
    // a session primed from parquet serves the persisted tokenizer
    // (≤ NumMerges rows — a negligible collect) instead of refitting
    Dedup.memoGet(spark, s"bpeMergesFit|$dir").foreach { df =>
      val m = df.orderBy("rank").collect()
        .map(r => (r.getString(r.fieldIndex("a")), r.getString(r.fieldIndex("b"))))
        .toSeq
      if (m.nonEmpty) { fitCache.put(key, m); return m }
    }
    val merges = Bpe.train(wordHistogram(spark, dir).toSeq, NumMerges)
    fitCache.put(key, merges)
    merges
  }

  /** The fitted tokenizer as a persistable table (rank, a, b) — the
    * model artifact writeIndexes ships with the index set and
    * primeIndexes loads back. */
  private[operators] def mergesTable(spark: SparkSession, dir: String): DataFrame =
    Dedup.memo(spark, s"bpeMergesFit|$dir") {
      val m = fitMerges(spark, dir)
      spark.createDataFrame(m.zipWithIndex.map { case ((a, b), i) => (i, a, b) })
        .toDF("rank", "a", "b")
    }

  /** Per-document token accounting under the LEARNED tokenizer —
    * q_text_token_count_bpe's twin with the fitted table, plus the
    * fixed-table count so the fit's compression gain is visible in one
    * row. Plan: one narrow codegen'd map per row, no shuffle before
    * the presentation sort. */
  def bpeTokenCountFit(spark: SparkSession, dir: String): DataFrame = {
    val merges = fitMerges(spark, dir)
    Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).as("n_chars_calc"),
        BpeTokenizeLearnedColumn(col("text"), merges).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("bpe_tokens_fit"),
        round(col("n_chars_calc").cast("double") /
          greatest(size(col("toks")), lit(1)), 6).as("chars_per_token_fit"))
      .orderBy("doc_id")
  }

  /** Dynamic oracle for [[bpeTokenCountFit]]: the DuckDB replay under
    * the merges fitted on THIS corpus, inlined at dump time. */
  def tokenCountFitOracle(spark: SparkSession, dir: String): String =
    s"""WITH RECURSIVE
       |${Bpe.oracleToksCtesFor(fitMerges(spark, dir))}
       |SELECT d.doc_id,
       |  CAST(len(b.toks) AS BIGINT) AS bpe_tokens_fit,
       |  round(CAST(length(d.text) AS DOUBLE) / greatest(len(b.toks), 1), 6) AS chars_per_token_fit
       |FROM documents d JOIN bpe_toks b USING (doc_id)
       |ORDER BY doc_id""".stripMargin
}
