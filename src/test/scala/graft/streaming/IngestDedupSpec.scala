package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Two-tier continuous-ingest dedup semantics: within-stream collapse
  * via watermarked fingerprint state, corpus flagging via the
  * stream-static join, and stream/batch fingerprint parity. */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(ts: Timestamp, doc_id: Long, text: String)
  private def ts(s: String) = Timestamp.valueOf(s)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "an entirely different corpus document"))
      .map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("ingest dedup: within-stream collapse + corpus flag, fingerprints match batch") {
    implicit val sq = spark.sqlContext
    val corpusFp = IngestDedup.corpusFingerprints(spark, corpusDir)
    val input = MemoryStream[Doc]
    val q = IngestDedup.dedupIngest(input.toDF(), corpusFp)
      .writeStream.format("memory").queryName("ingest").outputMode("append").start()
    withQuery(q) {
      input.addData(
        // case/whitespace variant of corpus doc 1 → same fingerprint
        Doc(ts("2024-01-01 10:00:00"), 100L, "The  Quick Brown  Fox jumps over the lazy dog"),
        // novel document
        Doc(ts("2024-01-01 10:01:00"), 101L, "a brand new never seen document"),
        // exact replay of 101's text within the watermark → collapsed
        Doc(ts("2024-01-01 10:02:00"), 102L, "a brand new never seen document"))
      q.processAllAvailable()
      val out = spark.table("ingest")
        .select("doc_id", "fp", "in_corpus")
        .as[(Long, String, Boolean)].collect()
      // 102 collapsed into 101; 100 flagged as already-in-corpus
      assert(out.map(_._1).sorted.toSeq == Seq(100L, 101L))
      val byDoc = out.map(r => r._1 -> r).toMap
      assert(byDoc(100L)._3, "corpus variant must be flagged in_corpus")
      assert(!byDoc(101L)._3, "novel doc must not be flagged")
      // stream-side fingerprint is byte-identical to the batch family's
      val batchFp = corpusFp.as[String].collect().toSet
      assert(batchFp.contains(byDoc(100L)._2))
      assert(!batchFp.contains(byDoc(101L)._2))
    }
  }

  test("a second batch after the first still dedups against stream state") {
    implicit val sq = spark.sqlContext
    val corpusFp = IngestDedup.corpusFingerprints(spark, corpusDir)
    val input = MemoryStream[Doc]
    val q = IngestDedup.dedupIngest(input.toDF(), corpusFp)
      .writeStream.format("memory").queryName("ingest2").outputMode("append").start()
    withQuery(q) {
      input.addData(Doc(ts("2024-01-01 10:00:00"), 200L, "some streamed document text"))
      q.processAllAvailable()
      // same fingerprint arrives in a LATER micro-batch, inside the watermark
      input.addData(Doc(ts("2024-01-01 10:10:00"), 201L, "Some   Streamed Document TEXT"))
      q.processAllAvailable()
      val ids = spark.table("ingest2").select("doc_id").as[Long].collect().toSeq
      assert(ids == Seq(200L), s"cross-batch replay must collapse, got $ids")
    }
  }
}
