package graft.operators

import graft.SparkSpec

/** Multimodal plumbing: the batched mapPartitions decode path must
  * agree with the columnar twin, and the binaryFile source must load
  * raw files into the same (path, length, content) shape. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mapPartitions batch decode equals the columnar feature path") {
    val dir = sf("sf0.001")
    val typed = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir), batchSize = 7)
      .collect().map(f => (f.doc_id, (f.media_type, f.byte_len, f.sha256_hex,
        f.width, f.height, f.n_frames))).toMap
    val columnar = Multimodal.featuresColumnar(spark, dir)
      .as[(Long, String, Long, String, Int, Int, Int)].collect()
    assert(columnar.nonEmpty)
    columnar.foreach { case (id, mt, len, sha, w, h, fr) =>
      assert(typed(id) == ((mt, len, sha, w, h, fr)), s"doc $id")
    }
  }

  test("payload bytes round-trip: sha256 matches an independent digest") {
    val row = Multimodal.mediaTable(spark, sf("sf0.001")).head()
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest(row.payload).map("%02x".format(_)).mkString
    val got = Multimodal.featuresColumnar(spark, sf("sf0.001"))
      .filter($"doc_id" === row.doc_id).select("sha256_hex").as[String].head()
    assert(got == expected)
  }

  test("binaryFile source loads raw files as (path, length, content)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
    val payloads = Map("a.bin" -> Array[Byte](1, 2, 3), "b.bin" -> Array[Byte](9, 8, 7, 6))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(dir.resolve(name), bytes)
    }
    val df = spark.read.format("binaryFile").load(dir.toString)
    val rows = df.select("path", "length", "content")
      .as[(String, Long, Array[Byte])].collect()
      .map { case (p, l, c) => (p.split('/').last, (l, c.toSeq)) }.toMap
    assert(rows.keySet == payloads.keySet)
    payloads.foreach { case (name, bytes) =>
      assert(rows(name) == ((bytes.length.toLong, bytes.toSeq)))
    }
  }
}
