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

  test("frame sampling emits ceil(n_frames/k) rows per video, indices strided") {
    val frames = Multimodal.frameSamples(spark, sf("sf0.001"), everyK = 5)
      .select("doc_id", "frame_idx", "n_frames")
      .as[(Long, Int, Int)].collect()
    assert(frames.nonEmpty)
    frames.groupBy(_._1).foreach { case (id, rows) =>
      val n = rows.head._3
      assert(rows.length == (n + 4) / 5, s"doc $id: ${rows.length} rows for $n frames")
      assert(rows.map(_._2).sorted.sameElements(0 until n by 5))
    }
  }

  test("resize plan fits the box, preserves aspect, never upscales") {
    val dims = Multimodal.resizePlan(spark, sf("sf0.001"), box = 256)
      .as[(Long, Int, Int, Long, Long)].collect()
    assert(dims.nonEmpty)
    dims.foreach { case (id, w, h, ow, oh) =>
      assert(ow <= w && oh <= h, s"doc $id upscaled")
      assert(math.max(ow, oh) <= 256, s"doc $id exceeds box")
      if (math.max(w, h) > 256) {
        assert(math.max(ow, oh) == 256, s"doc $id under-uses box: ${ow}x$oh")
        // integer-floor aspect preservation: out/in ratios differ by < 1 px
        assert(math.abs(ow.toDouble / w - oh.toDouble / h) < 1.0 / math.min(w, h))
      } else assert(ow == w && oh == h)
    }
  }

  test("media dedup partitions every asset and keeps the lowest id per digest") {
    val dir = sf("sf0.001")
    val total = Multimodal.mediaTable(spark, dir).count()
    val out = Multimodal.mediaDedup(spark, dir)
      .select("media_type", "keep_id", "n_copies")
      .as[(String, Long, Long)].collect()
    assert(out.map(_._3).sum == total, "every asset in exactly one digest group")
    assert(out.map(_._1).toSet.subsetOf(Set("image", "audio", "video")))
    // keep_id is a member of its own (type) stripe: round-robin assignment
    out.foreach { case (mt, keep, _) =>
      val expected = Seq("image", "audio", "video")((keep % 3).toInt)
      assert(mt == expected, s"keep_id $keep cannot be of type $mt")
    }
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
