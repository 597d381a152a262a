package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Multimodal column support (SURVEY.md §2.12 E5): media payloads are
  * opaque `BinaryType` columns travelling next to a typed metadata
  * struct; decode / feature-extraction runs as batched per-partition
  * processing over the binary column.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly marked STUB (`FakeDecoder`) — a deterministic function of
  * the bytes. Everything around it is the real engineering surface:
  * schema (binary + struct), partition-level batching, the typed
  * Dataset path, and the column-function twin the oracle checks.
  *
  * Scale posture: payloads never pass through a shuffle — features are
  * extracted in the scan stage (narrow), and only the small feature
  * rows move on. At 100 TB the payload column lives in its own parquet
  * column chunks, so feature-only queries never read the bytes
  * (column pruning), and `spark.read.format("binaryFile")` feeds raw
  * object stores the same shape (MultimodalSpec covers that source).
  */
object Multimodal {

  /** A multimodal record: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte],
                      lang: String, source: String)

  /** Extracted features for one payload. */
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
                           sha256_hex: String, width: Int, height: Int,
                           n_frames: Int)

  /** STUB decode kernel — stands in for an image/audio/video codec
    * (none available in this environment). Deterministic in the bytes:
    * "dimensions" are arithmetic in the payload length, "frame count"
    * only for video. The real implementation would slot in here with
    * the same signature (bytes in, features out) without touching any
    * plan shape. */
  object FakeDecoder {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int) = {
      val len = payload.length
      val width = 1 + len % 1024
      val height = 1 + (len * 7) % 768
      val frames = if (mediaType == "video") 1 + len % 250 else 1
      (width, height, frames)
    }
  }

  /** The documents table lifted to a multimodal shape: payload =
    * UTF-8 bytes of the text (a stand-in for real media bytes),
    * media_type assigned round-robin. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        col("lang"), col("source"))
      .as[MediaRow]
  }

  /** Batched per-partition decode: the mapPartitions shape a real
    * codec UDF needs (amortize per-batch model/codec setup across
    * `batchSize` rows), kept as a typed Dataset transform. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would happen here (codec init, model load)
        batch.iterator.map { r =>
          val (w, h, f) = FakeDecoder.decode(r.media_type, r.payload)
          val sha = java.security.MessageDigest.getInstance("SHA-256")
            .digest(r.payload).map("%02x".format(_)).mkString
          MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, sha, w, h, f)
        }
      }
    }
  }

  /** Column-function twin of extractFeatures — whole-stage-codegen'd,
    * and the form the DuckDB oracle can check. MultimodalSpec pins
    * that both paths agree row-for-row. */
  def featuresColumnar(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .select(col("doc_id"), col("media_type"),
        length(col("payload")).cast("long").as("byte_len"),
        sha2(col("payload"), 256).as("sha256_hex"))
      .select(col("doc_id"), col("media_type"), col("byte_len"), col("sha256_hex"),
        (lit(1) + col("byte_len") % 1024).cast("int").as("width"),
        (lit(1) + (col("byte_len") * 7) % 768).cast("int").as("height"),
        when(col("media_type") === "video", lit(1) + col("byte_len") % 250)
          .otherwise(lit(1)).cast("int").as("n_frames"))
      .orderBy("doc_id")

  /** Per-media-type rollup over the features — the "what's in this
    * 100 TB bucket" inventory query. */
  def mediaInventory(spark: SparkSession, dir: String): DataFrame =
    featuresColumnar(spark, dir)
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_files"), sum(col("byte_len")).as("total_bytes"),
        max(col("byte_len")).as("max_bytes"))
      .orderBy("media_type")
}

/** Driver-contract registration for the multimodal set. */
object MultimodalModule extends QueryModule {
  import Multimodal._

  def queries = Map(
    "q_media_features" -> ((s: SparkSession, d: String) => featuresColumnar(s, d)),
    "q_media_inventory" -> ((s: SparkSession, d: String) => mediaInventory(s, d)))

  // DuckDB's sha256 hashes the VARCHAR's UTF-8 bytes — identical input
  // bytes to Spark's sha2(encode(text,'UTF-8'), 256).
  def oracles = Map(
    "q_media_features" ->
      """WITH m AS (SELECT doc_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |    sha256(text) AS sha256_hex
        |  FROM documents)
        |SELECT doc_id, media_type, byte_len, sha256_hex,
        |  CAST(1 + byte_len % 1024 AS INT) AS width,
        |  CAST(1 + (byte_len * 7) % 768 AS INT) AS height,
        |  CAST(CASE WHEN media_type = 'video' THEN 1 + byte_len % 250 ELSE 1 END AS INT) AS n_frames
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_media_inventory" ->
      """WITH m AS (SELECT doc_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
        |  FROM documents)
        |SELECT media_type, COUNT(*) AS n_files,
        |  CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
        |  MAX(byte_len) AS max_bytes
        |FROM m GROUP BY media_type ORDER BY media_type""".stripMargin)
}
