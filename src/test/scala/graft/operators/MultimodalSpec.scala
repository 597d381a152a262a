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

  // ---- Real-payload fixtures: genuine container headers ------------

  /** A minimal real PNG: signature + IHDR chunk declaring 640×480.
    * Header-complete (the kernel reads only bytes 0–23); the CRC and
    * image data are irrelevant to dimension parsing. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0) // bit depth…interlace + dummy CRC
  }

  /** A minimal real JPEG: SOI, an APP0 (JFIF) segment the scanner must
    * walk over, then a SOF0 frame header declaring the dimensions. */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    Array(0xff, 0xd8).map(_.toByte) ++
      (Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
        "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) ++
      (Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++ Array[Byte](8) ++
        be16(h) ++ be16(w) ++
        Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)) ++
      Array(0xff, 0xd9).map(_.toByte)
  }

  /** A minimal real WAV: RIFF/WAVE header, an extra LIST chunk the
    * walker must skip (odd-sized, exercising the RIFF pad byte), the
    * fmt chunk, then a data chunk sized for `nSamples` frames. */
  private def wavBytes(rate: Int, ch: Int, bits: Int, nSamples: Int): Array[Byte] = {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val align = ch * bits / 8
    val dataLen = nSamples * align
    val list = "LIST".getBytes("US-ASCII") ++ le32(5) ++
      Array[Byte]('I', 'N', 'F', 'O', 'x', 0) // 5 data bytes + pad
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(ch) ++ le32(rate) ++ le32(rate * align) ++
      le16(align) ++ le16(bits)
    val data = "data".getBytes("US-ASCII") ++ le32(dataLen) ++
      Array.fill[Byte](dataLen)(0)
    "RIFF".getBytes("US-ASCII") ++ le32(4 + list.length + fmt.length + data.length) ++
      "WAVE".getBytes("US-ASCII") ++ list ++ fmt ++ data
  }

  /** A minimal real MP4: ftyp, a free box the walker must skip, then
    * moov containing a version-0 mvhd declaring timescale/duration. */
  private def mp4Bytes(timescale: Int, duration: Int): Array[Byte] = {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val ftyp = be32(16) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be32(0)
    val free = be32(11) ++ "free".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    val mvhd = be32(108) ++ "mvhd".getBytes("US-ASCII") ++ be32(0) ++ // ver 0 + flags
      be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
      Array.fill[Byte](108 - 32)(0)
    val moov = be32(8 + mvhd.length) ++ "moov".getBytes("US-ASCII") ++ mvhd
    ftyp ++ free ++ moov
  }

  /** A real MP4 with sample tables: ftyp, then moov holding mvhd, an
    * AUDIO trak first (the walk must skip non-video handlers), and a
    * video trak whose stts declares `sampleCounts` — frame count =
    * their sum. */
  private def mp4BytesWithTracks(timescale: Int, duration: Int,
                                 sampleCounts: Seq[Int]): Array[Byte] = {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    def trak(handler: String, counts: Seq[Int]): Array[Byte] = {
      val hdlr = box("hdlr", be32(0) ++ be32(0) ++
        handler.getBytes("US-ASCII") ++ Array.fill[Byte](12)(0))
      val stts = box("stts", be32(0) ++ be32(counts.length) ++
        counts.toArray.flatMap(c => be32(c) ++ be32(1000)))
      box("trak", box("mdia", hdlr ++ box("minf", box("stbl", stts))))
    }
    val ftyp = be32(16) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be32(0)
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ Array.fill[Byte](108 - 32)(0))
    ftyp ++ box("moov", mvhd ++ trak("soun", Seq(99)) ++ trak("vide", sampleCounts))
  }

  test("MP4 stts sample-table walk yields the video track's true frame count") {
    import graft.functions.MediaHeaders
    // 3 stts entries (variable frame durations — the common case after
    // editing): frame count is the entry-count sum, 24+36+12 = 72, and
    // the audio track's 99 samples must NOT be picked up
    val real = mp4BytesWithTracks(30000, 30000 * 3, Seq(24, 36, 12))
    assert(MediaHeaders.mp4Info(real).toSeq == Seq(30000L, 90000L, 72L))
    // header-only movie (no trak): fields parse, frame count is -1
    assert(MediaHeaders.mp4Info(mp4Bytes(1000, 2500)).toSeq == Seq(1000L, 2500L, -1L))
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // hostile stts: declared entry count far beyond the box's own size
    // must be rejected (stub fallback), not drive the sum loop off the
    // buffer — craft it by patching the real fixture's entry count
    val sttsAt = {
      val s = real.indexOfSlice("stts".getBytes("US-ASCII"),
        real.indexOfSlice("vide".getBytes("US-ASCII")))
      s - 4 // back to the box's size field
    }
    val hostile = real.patch(sttsAt + 8 + 4, be32(0x7fffffff), 4)
    assert(MediaHeaders.mp4Info(hostile).toSeq == Seq(30000L, 90000L, -1L),
      "hostile stts entry count must yield -1, not a crash or bogus sum")
    // truncated mid-sample-table: the clamped box end rejects the count
    val truncated = real.dropRight(6)
    assert(MediaHeaders.mp4Info(truncated) == null ||
      MediaHeaders.mp4Info(truncated)(2) == -1L)
    // and through the registered query surface: q_media_video reports
    // the REAL count on the real fixture, the stub on text bytes
    import Multimodal.MediaRow
    val text = "not a movie".getBytes("UTF-8")
    val out = Multimodal.videoFeaturesOf(Seq(
      MediaRow(1L, "video", real, "en", "s"),
      MediaRow(2L, "video", text, "en", "s")).toDS().toDF())
      .select("doc_id", "n_frames").as[(Long, Int)].collect().toMap
    assert(out(1L) == 72, "true stts frame count must surface in q_media_video")
    assert(out(2L) == 1 + (text.length % 250), "non-container keeps the stub count")
  }

  test("real MP4 payloads decode true movie-header fields; non-containers keep the stub") {
    import Multimodal.MediaRow
    val text = "definitely not a movie, just some text".getBytes("UTF-8")
    val rows = Seq(
      MediaRow(1L, "video", mp4Bytes(90000, 90000 * 42), "en", "s"), // 42 s broadcast
      MediaRow(2L, "video", mp4Bytes(1000, 2500), "en", "s"),        // 2.5 s web clip
      MediaRow(3L, "video", text, "en", "s"),
      MediaRow(4L, "video", mp4Bytes(90000, 100).take(30), "en", "s")) // truncated
    val out = Multimodal.videoFeaturesOf(rows.toDS().toDF())
      .select("doc_id", "timescale", "duration_units", "duration_ms")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((90000L, 90000L * 42, 42000L)),
      "mvhd timescale/duration must be the true movie-header values")
    assert(out(2L) == ((1000L, 2500L, 2500L)))
    def stub(p: Array[Byte]) = {
      val len = p.length.toLong
      val ts = Seq(600L, 1000L, 90000L, 24000L, 30000L)((len % 5).toInt)
      val du = 1L + (len * 17) % 3600000L
      (ts, du, du * 1000 / ts)
    }
    assert(out(3L) == stub(text), "text bytes fall through to the stub")
    assert(out(4L) == stub(mp4Bytes(90000, 100).take(30)), "truncated box walk falls through")
    // none of these fixtures carries a video sample table, so n_frames
    // falls back to the stub (matching frameSamples) in every row —
    // the stts walk's true counts are pinned in their own test above
    val frames = Multimodal.videoFeaturesOf(rows.toDS().toDF())
      .select("doc_id", "n_frames").as[(Long, Int)].collect().toMap
    rows.foreach { r =>
      assert(frames(r.doc_id) == 1 + (r.payload.length % 250))
    }
  }

  test("hostile headers never throw: crafted sizes, truncated fill bytes, largesize boxes") {
    import graft.functions.MediaHeaders
    def le32(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // WAV whose first chunk declares size 0x7ffffff0: an Int walk index
    // would wrap negative and read b(-...); must return null instead
    val hugeChunkWav = "RIFF".getBytes("US-ASCII") ++ le32(36) ++
      "WAVE".getBytes("US-ASCII") ++ "LIST".getBytes("US-ASCII") ++
      le32(0x7ffffff0L) ++ Array.fill[Byte](24)(0)
    assert(MediaHeaders.wavInfo(hugeChunkWav) == null)
    // and the full unsigned range, which is > Int.MaxValue
    val unsignedWav = hugeChunkWav.patch(16, le32(0xfffffff0L), 4)
    assert(MediaHeaders.wavInfo(unsignedWav) == null)
    // truncated JPEG ending in fill bytes before a SOF marker: the
    // fill-byte skip advances past the loop-head bounds check
    assert(MediaHeaders.imageDims(
      Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xc0).map(_.toByte)) == null)
    // moov carrying a 64-bit largesize header: children start at +16
    val mvhd = be32(108) ++ "mvhd".getBytes("US-ASCII") ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(48000) ++ be32(96000) ++
      Array.fill[Byte](108 - 32)(0)
    val moovLarge = be32(1) ++ "moov".getBytes("US-ASCII") ++
      be32(0) ++ be32(16 + mvhd.length) ++ mvhd // largesize in two halves
    val ftyp = be32(16) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be32(0)
    assert(MediaHeaders.mp4Info(ftyp ++ moovLarge).toSeq == Seq(48000L, 96000L, -1L),
      "largesize moov must parse (children start after the 16-byte header)")
    // v1 mvhd with a near-Long.MaxValue duration: downstream *1000
    // would wrap — the kernel must reject it as garbage
    val mvhdHostile = be32(120) ++ "mvhd".getBytes("US-ASCII") ++
      Array[Byte](1, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(90000) ++ be32(0x7fffffffL) ++ be32(0xffffffffL) ++
      Array.fill[Byte](120 - 40)(0)
    val moovHostile = be32(8 + mvhdHostile.length) ++ "moov".getBytes("US-ASCII") ++ mvhdHostile
    assert(MediaHeaders.mp4Info(ftyp ++ moovHostile) == null,
      "implausible 64-bit duration must be rejected, not propagated")
  }

  test("real WAV payloads decode true header fields; non-containers keep the stub") {
    import Multimodal.MediaRow
    val text = "just some text bytes standing in for audio".getBytes("UTF-8")
    val truncated = wavBytes(44100, 2, 16, 100).take(20) // dies mid-walk
    val rows = Seq(
      MediaRow(1L, "audio", wavBytes(44100, 2, 16, 44100), "en", "s"), // 1 s stereo CD
      MediaRow(2L, "audio", wavBytes(16000, 1, 8, 8000), "en", "s"),   // 0.5 s phone mono
      MediaRow(3L, "audio", text, "en", "s"),
      MediaRow(4L, "audio", truncated, "en", "s"),
      MediaRow(5L, "image", wavBytes(44100, 2, 16, 10), "en", "s"))    // wrong modality
    val out = Multimodal.audioFeaturesOf(rows.toDS().toDF())
      .select("doc_id", "sample_rate", "channels", "bits_per_sample", "n_samples", "duration_ms")
      .as[(Long, Int, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out(1L) == ((44100, 2, 16, 44100, 1000L)),
      "WAV fmt/data fields must be the true header values")
    assert(out(2L) == ((16000, 1, 8, 8000, 500L)))
    def stub(p: Array[Byte]) = {
      val len = p.length.toLong
      val rate = Seq(8000, 16000, 22050, 44100, 48000)((len % 5).toInt)
      val n = (1L + (len * 13) % 480000).toInt
      (rate, (1 + len % 2).toInt, (8 * (1 + len % 3)).toInt, n, n * 1000L / rate)
    }
    assert(out(3L) == stub(text), "text bytes fall through to the stub")
    assert(out(4L) == stub(truncated), "truncated container falls through")
    assert(!out.contains(5L), "audio features only cover audio rows")
    // the kernel itself is modality-blind: the mislabeled row's payload
    // still parses when asked directly
    assert(graft.functions.MediaHeaders.wavInfo(wavBytes(44100, 2, 16, 10)).toSeq ==
      Seq(44100, 2, 16, 10))
  }

  test("real PNG/JPEG payloads decode true header dimensions; non-containers keep the stub") {
    import Multimodal.MediaRow
    val text = "not an image at all, just text bytes".getBytes("UTF-8")
    val truncatedPng = pngBytes(640, 480).take(8) // signature only
    val rows = Seq(
      MediaRow(1L, "image", pngBytes(640, 480), "en", "s"),
      MediaRow(2L, "image", jpegBytes(1920, 1080), "en", "s"),
      MediaRow(3L, "image", text, "en", "s"),
      MediaRow(4L, "image", truncatedPng, "en", "s"),
      // a real PNG labeled audio: dispatch is on media_type, so stub
      MediaRow(5L, "audio", pngBytes(640, 480), "en", "s"),
      MediaRow(6L, "video", text, "en", "s"))
    val out = Multimodal.featuresColumnarOf(rows.toDS().toDF())
      .select("doc_id", "width", "height", "n_frames")
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def fake(mt: String, p: Array[Byte]) = Multimodal.FakeDecoder.decode(mt, p)
    assert(out(1L) == ((640, 480, 1)), "PNG IHDR dims must be the true pixels")
    assert(out(2L) == ((1920, 1080, 1)), "JPEG SOF0 dims must be the true pixels")
    assert(out(3L) == fake("image", text), "text bytes fall through to the stub")
    assert(out(4L) == fake("image", truncatedPng), "truncated container falls through")
    assert(out(5L) == fake("audio", pngBytes(640, 480)), "non-image media_type keeps the stub")
    assert(out(6L) == fake("video", text))
  }

  test("header decode differential: typed mapPartitions path equals the columnar path on real payloads") {
    import Multimodal.MediaRow
    val rows = Seq(
      MediaRow(1L, "image", pngBytes(7, 5), "en", "s"),
      MediaRow(2L, "image", jpegBytes(13, 11), "en", "s"),
      MediaRow(3L, "image", "plain old bytes".getBytes("UTF-8"), "en", "s"),
      MediaRow(4L, "audio", "zzz".getBytes("UTF-8"), "en", "s"),
      MediaRow(5L, "video", "vvv".getBytes("UTF-8"), "en", "s"))
    val typed = Multimodal.extractFeatures(rows.toDS(), batchSize = 2)
      .collect().map(f => f.doc_id -> ((f.width, f.height, f.n_frames, f.sha256_hex))).toMap
    val columnar = Multimodal.featuresColumnarOf(rows.toDS().toDF())
      .select("doc_id", "width", "height", "n_frames", "sha256_hex")
      .as[(Long, Int, Int, Int, String)].collect()
    assert(columnar.length == 5)
    columnar.foreach { case (id, w, h, f, sha) =>
      assert(typed(id) == ((w, h, f, sha)), s"doc $id diverges between paths")
    }
    assert(typed(1L)._1 == 7 && typed(1L)._2 == 5)
    assert(typed(2L)._1 == 13 && typed(2L)._2 == 11)
  }

  test("mediaTableFromFiles: raw files → media table → true header dims end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media-files")
    java.nio.file.Files.write(dir.resolve("photo.png"), pngBytes(320, 200))
    java.nio.file.Files.write(dir.resolve("scan.jpeg"), jpegBytes(800, 600))
    java.nio.file.Files.write(dir.resolve("notes.txt"), "hello".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("voice.wav"), wavBytes(22050, 1, 16, 22050))
    java.nio.file.Files.write(dir.resolve("clip.mp4"), mp4Bytes(1000, 7250))
    val media = Multimodal.mediaTableFromFiles(spark, dir.toString)
    val byName = media.collect().map(r => r.source.split('/').last -> r).toMap
    assert(byName("photo.png").media_type == "image")
    assert(byName("scan.jpeg").media_type == "image")
    assert(byName("notes.txt").media_type == "binary")
    assert(byName("voice.wav").media_type == "audio")
    assert(byName("clip.mp4").media_type == "video")
    assert(byName.values.map(_.doc_id).toSet.size == 5, "path-hash ids must be distinct")
    val feats = Multimodal.featuresColumnarOf(media.toDF())
      .select("doc_id", "width", "height").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(feats(byName("photo.png").doc_id) == ((320, 200)))
    assert(feats(byName("scan.jpeg").doc_id) == ((800, 600)))
    val audio = Multimodal.audioFeaturesOf(media.toDF())
      .select("doc_id", "sample_rate", "channels", "bits_per_sample", "duration_ms")
      .as[(Long, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(audio(byName("voice.wav").doc_id) == ((22050, 1, 16, 1000L)),
      "raw .wav file must decode true header fields end-to-end")
    val video = Multimodal.videoFeaturesOf(media.toDF())
      .select("doc_id", "timescale", "duration_units", "duration_ms")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(video(byName("clip.mp4").doc_id) == ((1000L, 7250L, 7250L)),
      "raw .mp4 file must decode true movie-header fields end-to-end")
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
  test("perceptual dHash: identical payloads pair at Hamming 0, rank first") {
    import spark.implicits._
    // docs 3 and 9 (both doc_id % 3 == 0 -> image) share identical
    // payload text; everything else is distinct. The fake-pixel decode
    // is hash-based (no perceptual locality), so identity is the
    // planted near-dup; the REAL content here is the banding + cap +
    // Hamming algebra, which any codec-backed decode would feed.
    val dir = java.nio.file.Files.createTempDirectory("graft-phash").toString
    Seq(
      (3L, "the same exact payload text"),
      (9L, "the same exact payload text"),
      (6L, "completely different content here"),
      (12L, "yet another unrelated document"))
      .map { case (id, t) => (id, t, "en", "srcP", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.mediaPhashPairs(spark, dir).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getLong(1) == 3L && top.getLong(2) == 9L && top.getLong(3) == 0L,
      s"identical payloads must rank first at Hamming 0: ${out.mkString(";")}")
    assert(out.tail.forall(_.getLong(3) > 0L),
      "no other pair may score Hamming 0")
  }

  // ---- REAL pixel decode: full images via javax.imageio -------------

  /** A real, decodable image rendered in memory: `f(x, y)` is the RGB
    * of each pixel. */
  private def renderImage(w: Int, h: Int)(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val b = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) b.setRGB(x, y, f(x, y))
    b
  }

  private def encodeImage(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  // Nine luminance plateaus aligned to the dHash grid's nine columns:
  // adjacent column means differ by ≥ 30 luma, so JPEG's lossy noise
  // (±a few units on a block MEAN) cannot flip a gradient bit, while
  // the bit pattern still mixes 0s and 1s — a fixture that separates
  // "same picture, different encoder" from "different picture".
  private def plateauImage(vals: Array[Int]) = renderImage(96, 64) { (x, y) =>
    val v = vals(x * vals.length / 96) + (y % 2) // 1-unit dither, sub-noise
    (v << 16) | (v << 8) | v
  }
  // picture A: alternating plateaus → per-row bits 10101010
  private lazy val picA = plateauImage(Array(30, 200, 80, 230, 10, 160, 60, 250, 110))
  // picture B: monotone plateaus → all-ones bits, Hamming 32 from A
  private lazy val picB = plateauImage(Array(10, 40, 70, 100, 130, 160, 190, 220, 250))

  private def hamming(a: String, b: String): Int =
    a.zip(b).count(p => p._1 != p._2)

  test("pixel dHash: lossy re-encodes of one picture collide; different pictures diverge") {
    val aPng = encodeImage(picA, "png")
    val aJpg = encodeImage(picA, "jpg")
    val bPng = encodeImage(picB, "png")
    val ha1 = Multimodal.dhashOfImage(aPng).get
    val ha2 = Multimodal.dhashOfImage(aJpg).get
    val hb = Multimodal.dhashOfImage(bPng).get
    assert(ha1.length == 64 && ha1.exists(_ == '1') && ha1.exists(_ == '0'))
    // the done-criterion pins: two visually identical re-encodes within
    // Hamming 3 (JPEG perturbs pixels; block means barely move), two
    // different pictures far apart
    assert(hamming(ha1, ha2) <= 3,
      s"PNG vs JPEG of the SAME picture drifted: ${hamming(ha1, ha2)} bits")
    assert(hamming(ha1, hb) >= 16,
      s"different pictures too close: ${hamming(ha1, hb)} bits")
    // non-decodable bytes are None (callers fall back to the stub) —
    // including the header-only PNG fixture (valid IHDR, no pixel data)
    assert(Multimodal.dhashOfImage("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.dhashOfImage(pngBytes(640, 480)).isEmpty)
  }

  test("mediaDhash dispatch: decodable images take the pixel branch, everything else the stub twin") {
    import spark.implicits._
    val aPng = encodeImage(picA, "png")
    val aJpg = encodeImage(picA, "jpg")
    val bPng = encodeImage(picB, "png")
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", aPng, "en", "s"),
      Multimodal.MediaRow(2L, "image", aJpg, "en", "s"),
      Multimodal.MediaRow(3L, "image", bPng, "en", "s"),
      Multimodal.MediaRow(4L, "image", "plain text payload".getBytes("UTF-8"), "en", "s"),
      Multimodal.MediaRow(5L, "audio", aPng, "en", "s")) // dispatch is on media_type
    val bits = Multimodal.mediaDhash(spark.createDataset(rows))
      .collect().map(r => r.doc_id -> r.bits).toMap
    // real images: the pixel kernel, verified against a direct call
    assert(bits(1L) == Multimodal.dhashOfImage(aPng).get)
    assert(bits(3L) == Multimodal.dhashOfImage(bPng).get)
    // non-decodable image payload: the stub twin, byte-identical to the
    // oracled COLUMN path's md5 grid
    val colBits = Seq((4L, "plain text payload")).toDF("doc_id", "text")
      .select(Multimodal.dhashBits(org.apache.spark.sql.functions.col("text")))
      .collect()(0).getString(0)
    assert(bits(4L) == colBits,
      "stub twin must be byte-identical to the column path's md5 grid")
    // a real PNG labeled audio keeps the stub (type-scoped dispatch)
    assert(bits(5L) != bits(1L))
    // the shared pair algebra over REAL bits: the two re-encodes of
    // picture A are the top pair, within the banding guarantee
    val pairs = Multimodal.mediaPhashPairsReal(spark.createDataset(rows)).collect()
    assert(pairs.nonEmpty)
    val top = pairs.head
    assert(top.getString(0) == "image" && top.getLong(1) == 1L &&
      top.getLong(2) == 2L && top.getLong(3) <= 3L,
      s"re-encoded pair must rank first within Hamming 3: ${pairs.mkString(";")}")
    assert(!pairs.exists(p => p.getLong(1) == 1L && p.getLong(2) == 3L && p.getLong(3) <= 3L),
      "different pictures must not pair as near-dups")
  }

  test("stub fallback is lossless: distinct non-UTF-8 payloads fingerprint distinctly") {
    // the pre-r17 lenient decode collapsed every invalid byte sequence
    // to U+FFFD, so two DIFFERENT binary streams could share a
    // fingerprint and surface as a false Hamming-0 near-dup pair
    val a = Array.tabulate(64)(i => ((i * 7 + 0x80) & 0xFF).toByte)
    val b = Array.tabulate(64)(i => ((i * 11 + 0x80) & 0xFF).toByte)
    assert(Multimodal.stubTextOf(a) != Multimodal.stubTextOf(b),
      "distinct binary payloads must map to distinct stub inputs")
    assert(Multimodal.stubTextOf(a).startsWith("hex:"),
      "invalid UTF-8 must take the lossless hex branch")
    // valid UTF-8 keeps the byte-parity contract with the column path
    val t = "plain text payload"
    assert(Multimodal.stubTextOf(t.getBytes("UTF-8")) == t)
  }

  test("q_media_phash_real: registered fixture query ranks the re-encoded pair first") {
    val out = Multimodal.mediaPhashPairsRealFixture(spark).collect()
    assert(out.nonEmpty, "fixture corpus produced no candidate pairs")
    val top = out.head
    assert(top.getString(0) == "image" && top.getLong(3) <= 3L,
      s"top pair must be the PNG/JPEG re-encode within Hamming 3: ${out.mkString(";")}")
    // and it is the ONLY near-dup: every other surviving candidate is
    // a genuinely different picture or a stub fingerprint
    assert(out.tail.forall(_.getLong(3) > 3L),
      s"unexpected second near-dup pair: ${out.mkString(";")}")
  }
}
