package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3): explode row counts,
  * transcript join, dedup accounting, top-k containment, MinHash
  * estimate bounds, and a differential check of the JS-parseInt
  * kernel. Generated data is drawn with a FIXED seed so failures
  * reproduce; Spark-side properties evaluate one job over a whole
  * generated corpus instead of a job per case.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- generated corpus -------------------------------------------

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private val docGen: Gen[Seq[String]] =
    Gen.chooseNum(6, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))

  /** 24 base docs + exact copies (ids 100+) + near-copies (ids 200+,
    * one token changed). */
  private lazy val corpus: Seq[(Long, String)] = {
    val bases = (0 until 24).map(i => i.toLong -> sample(docGen, 1000 + i).mkString(" "))
    val copies = bases.take(6).map { case (id, t) => (100 + id) -> t }
    val nears = bases.slice(6, 12).map { case (id, t) =>
      val toks = t.split(" "); toks(toks.length / 2) = "CHANGED"
      (200 + id) -> toks.mkString(" ")
    }
    bases ++ copies ++ nears
  }

  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
    corpus.map { case (id, t) => (id, t, "en", "srcP", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def scalaShingles(t: String): Set[String] = {
    val toks = t.trim.toLowerCase.split("\\s+").toSeq
    (if (toks.length < 3) Seq(toks.mkString(" "))
     else toks.sliding(3).map(_.mkString(" ")).toSeq).toSet
  }

  private def scalaJaccard(a: String, b: String): Double = {
    val (sa, sb) = (scalaShingles(a), scalaShingles(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("property: the closed-form NTILE bucket math equals NTILE semantics for every (N, rank)") {
    // the z-order layout computes NTILE(64)'s values from (rank, total)
    // in pure integer math (ZOrder.zorderLayout); this pins the formula
    // against NTILE's definition — first N mod k buckets take
    // ceil(N/k) rows, the rest floor(N/k) — across the corner N
    // regimes (N < k, N = k, N multiple of k, N just past a boundary)
    val k = 64L
    def formula(r: Long, n: Long): Long = {
      val q = n / k; val rem = n % k
      if (r <= rem * (q + 1)) (r + q) / (q + 1)
      else rem + (r - rem * (q + 1) + q - 1) / q
    }
    def ntile(r: Long, n: Long): Long = {
      val q = n / k; val rem = n % k
      // definitional: walk the bucket boundaries
      var b = 1L; var upper = if (rem >= 1) q + 1 else q
      while (r > upper) { b += 1; upper += (if (b <= rem) q + 1 else q) }
      b
    }
    val ns = Seq(1L, 5L, 63L, 64L, 65L, 127L, 128L, 129L, 1000L, 4096L, 4097L, 15000L)
    for (n <- ns; r <- 1L to math.min(n, 600L))
      assert(formula(r, n) == ntile(r, n), s"mismatch at N=$n rank=$r")
    // and the tail ranks of each N (the last bucket boundary region)
    for (n <- ns; r <- math.max(1L, n - 200L) to n)
      assert(formula(r, n) == ntile(r, n), s"tail mismatch at N=$n rank=$r")
  }

  test("property: exact dedup partitions the corpus (sum of copies = corpus size, keep_id is group min)") {
    val out = operators.Dedup.exactDedup(spark, corpusDir)
      .as[(Long, Long)].collect()
    assert(out.map(_._2).sum == corpus.size)
    val byNorm = corpus.groupBy(_._2.trim.toLowerCase.replaceAll("\\s+", " "))
    val expected = byNorm.values.map(g => (g.map(_._1).min, g.size.toLong)).toSet
    assert(out.toSet == expected)
  }

  test("property: jaccardPairs scores equal the Scala set computation") {
    val byId = corpus.toMap
    val rows = operators.Dedup.jaccardPairs(spark, corpusDir)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, j) =>
      assert(math.abs(j - scalaJaccard(byId(a), byId(b))) < 1e-9, s"pair ($a,$b)")
    }
    // every exact copy pair must surface with jaccard 1.0
    (0 until 6).foreach { i =>
      assert(rows.exists(r => r._1 == i && r._2 == 100 + i && r._3 == 1.0),
        s"copy pair ($i, ${100 + i}) missing from top pairs")
    }
  }

  test("property: minhash estimate within sampling error of true jaccard (k=32 → ±0.35)") {
    val byId = corpus.toMap
    val rows = operators.Dedup.minhashLsh(spark, corpusDir)
      .select("id_a", "id_b", "est_jaccard").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, est) =>
      assert(math.abs(est - scalaJaccard(byId(a), byId(b))) <= 0.35, s"pair ($a,$b) est=$est")
    }
    (0 until 6).foreach { i =>
      assert(rows.exists(r => r._1 == i && r._2 == 100 + i && r._3 == 1.0),
        s"copy pair ($i, ${100 + i}) not at estimate 1.0")
    }
  }

  test("property: simhash hamming is 0 exactly for fingerprint-identical docs; copies rank first") {
    val rows = operators.Dedup.simhashPairs(spark, corpusDir)
      .as[(Long, Long, Int)].collect()
    (0 until 6).foreach { i =>
      val d = rows.find(r => r._1 == i && r._2 == 100 + i).map(_._3)
      assert(d.contains(0), s"copy pair ($i, ${100 + i}) hamming $d")
    }
  }

  test("property: approx percentiles track the exact sort-based twin (sf0.001)") {
    val exact = operators.Relational.percentiles(spark, sf("sf0.001"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val approx = operators.Relational.approxPercentiles(spark, sf("sf0.001"))
      .as[(String, Double, Double, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (status, a25, a50, a75) =>
      val (e25, e50, e75) = exact(status)
      assert(a25 <= a50 && a50 <= a75, s"$status: quantiles not monotone")
      // sketch returns a data value near the exact interpolated quantile
      assert(math.abs(a50 - e50) / e50 < 0.05, s"$status p50: $a50 vs $e50")
      assert(math.abs(a25 - e25) / e25 < 0.05, s"$status p25: $a25 vs $e25")
      assert(math.abs(a75 - e75) / e75 < 0.05, s"$status p75: $a75 vs $e75")
    }
  }

  test("property: token histogram counts equal the Scala multiset count") {
    val expected = corpus.flatMap(_._2.trim.toLowerCase.split("\\s+")).groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    val got = operators.TextAnalysis.tokenHistogram(spark, corpusDir)
      .as[(String, Long)].collect()
    got.foreach { case (t, n) => assert(expected(t) == n, s"token $t") }
    assert(got.map(_._2).toSeq == got.map(_._2).sortBy(-_).toSeq)
  }

  test("property: top-k orders is the prefix of the full Scala-side ranking (sf0.001)") {
    val full = sources.Tables.orders(spark, sf("sf0.001"))
      .select("o_orderkey", "o_totalprice").as[(Long, Double)].collect()
      .sortBy { case (k, p) => (-p, k) }.take(10).map(_._1).toSeq
    val topk = operators.Relational.topOrders(spark, sf("sf0.001"))
      .select("o_orderkey").as[Long].collect().toSeq
    assert(topk == full)
  }

  test("redaction replaces emails, URLs, and IPs with type tags") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("contact me at jane.doe+x@example.co.uk today",
        "contact me at <EMAIL> today"),
      ("see https://example.com/a?b=1 and http://x.io",
        "see <URL> and <URL>"),
      ("server 10.0.255.3 responded", "server <IP> responded"),
      ("mixed: a@b.com https://c.d/e 1.2.3.4 end",
        "mixed: <EMAIL> <URL> <IP> end"),
      ("no pii here", "no pii here"))
    val out = cases.map(_._1).toDF("text")
      .select(operators.TextAnalysis.redactText(col("text")).as("r"))
      .as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got == want)
    }
  }

  test("property (differential): ParseIntJs kernel vs an independent reference on random strings") {
    def reference(s: String): Option[Int] = {
      // independent formulation: takeWhile + BigInt (the kernel uses a
      // manual accumulate loop)
      val t = s.dropWhile(c => Character.isWhitespace(c) || c == '\u00a0' || c == '\ufeff')
      val (sign, afterSign) =
        if (t.startsWith("-")) (-1, t.drop(1))
        else if (t.startsWith("+")) (1, t.drop(1)) else (1, t)
      val (radix, body) =
        if (afterSign.length >= 2 && afterSign(0) == '0' &&
          (afterSign(1) == 'x' || afterSign(1) == 'X')) (16, afterSign.drop(2))
        else (10, afterSign)
      val digits = body.takeWhile(c => Character.digit(c, radix) >= 0)
      if (digits.isEmpty) None
      else {
        val v = BigInt(digits, radix) * sign
        if (v.isValidInt) Some(v.toInt) else None
      }
    }
    val charGen = Gen.frequency(8 -> Gen.numChar, 2 -> Gen.oneOf('x', 'X', 'a', 'f', 'g'),
      2 -> Gen.oneOf('+', '-', '.', ' ', '\t'), 1 -> Gen.alphaChar)
    val strGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val prop = Prop.forAll(strGen) { s =>
      val got = Option(functions.JsParseInt.parse(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))).map(_.intValue())
      got == reference(s)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000)
        .withInitialSeed(Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("property (differential): MediaHeaders round-trips constructed PNG/JPEG dims; garbage never parses or throws") {
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def png(w: Int, h: Int) =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
        Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
    // pad with junk APPn segments before the SOF so the walk is exercised
    def jpeg(w: Int, h: Int, nApp: Int, appLen: Int) = {
      val app = Array(0xff, 0xe1).map(_.toByte) ++ be16(appLen + 2) ++
        Array.fill(appLen)(0x55.toByte)
      Array(0xff, 0xd8).map(_.toByte) ++
        (0 until nApp).flatMap(_ => app).toArray ++
        (Array(0xff, 0xc2).map(_.toByte) ++ be16(17) ++ Array[Byte](8) ++
          be16(h) ++ be16(w) ++ Array.fill(10)(1.toByte))
    }
    val dimGen = Gen.chooseNum(1, 65535)
    val pngProp = Prop.forAll(dimGen, dimGen) { (w, h) =>
      functions.MediaHeaders.imageDims(png(w, h)).toSeq == Seq(w, h)
    }
    val jpegProp = Prop.forAll(dimGen, dimGen,
        Gen.chooseNum(0, 4), Gen.chooseNum(0, 40)) { (w, h, nApp, appLen) =>
      functions.MediaHeaders.imageDims(jpeg(w, h, nApp, appLen)).toSeq == Seq(w, h)
    }
    // arbitrary bytes: never throws, and (modulo an astronomically
    // unlikely random valid header) returns null
    val bytesGen = Gen.chooseNum(0, 64)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
    val garbageProp = Prop.forAll(bytesGen) { bs =>
      functions.MediaHeaders.imageDims(bs.toArray); true
    }
    for ((p, name) <- Seq(pngProp -> "png", jpegProp -> "jpeg", garbageProp -> "garbage")) {
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(500)
          .withInitialSeed(Seed(11L)), p)
      assert(res.passed, s"$name: ${res.status}")
    }
  }

  test("property (differential): MediaHeaders round-trips constructed WAV fields; garbage never parses or throws") {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // nJunk odd-sized junk chunks before fmt exercise the chunk walk
    // and the RIFF pad-byte rule; data bytes are elided (header-level
    // parsing trusts the declared size, as on a truncated object read)
    def wav(rate: Int, ch: Int, bits: Int, n: Int, nJunk: Int, junkLen: Int) = {
      val align = ch * bits / 8
      val junk = "LIST".getBytes("US-ASCII") ++ le32(junkLen) ++
        Array.fill(junkLen + (junkLen & 1))(0x55.toByte)
      val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
        le16(1) ++ le16(ch) ++ le32(rate) ++ le32(rate * align) ++
        le16(align) ++ le16(bits)
      val data = "data".getBytes("US-ASCII") ++ le32(n * align)
      "RIFF".getBytes("US-ASCII") ++ le32(0) ++ "WAVE".getBytes("US-ASCII") ++
        (0 until nJunk).flatMap(_ => junk).toArray ++ fmt ++ data
    }
    val wavProp = Prop.forAll(
        Gen.oneOf(8000, 16000, 22050, 44100, 48000, 96000),
        Gen.chooseNum(1, 8), Gen.oneOf(8, 16, 24, 32),
        Gen.chooseNum(0, 1 << 20),
        Gen.chooseNum(0, 3), Gen.chooseNum(0, 41)) { (rate, ch, bits, n, nJunk, junkLen) =>
      functions.MediaHeaders.wavInfo(wav(rate, ch, bits, n, nJunk, junkLen)).toSeq ==
        Seq(rate, ch, bits, n)
    }
    val bytesGen = Gen.chooseNum(0, 64)
      .flatMap(m => Gen.listOfN(m, Gen.chooseNum(-128, 127).map(_.toByte)))
    val garbageProp = Prop.forAll(bytesGen) { bs =>
      functions.MediaHeaders.wavInfo(bs.toArray); true
    }
    for ((p, name) <- Seq(wavProp -> "wav", garbageProp -> "wav-garbage")) {
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(500)
          .withInitialSeed(Seed(12L)), p)
      assert(res.passed, s"$name: ${res.status}")
    }
  }

  test("property (differential): MediaHeaders round-trips constructed MP4 mvhd fields; garbage never parses or throws") {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // nJunk skip-boxes between ftyp and moov exercise the sibling walk
    def mp4(ts: Int, dur: Int, ver: Int, nJunk: Int, junkLen: Int) = {
      val ftyp = be32(16) ++ "ftyp".getBytes("US-ASCII") ++
        "isom".getBytes("US-ASCII") ++ be32(0)
      val junk = be32(8 + junkLen) ++ "skip".getBytes("US-ASCII") ++
        Array.fill(junkLen)(0x55.toByte)
      val mvhd =
        if (ver == 0)
          be32(108) ++ "mvhd".getBytes("US-ASCII") ++ be32(0) ++
            be32(0) ++ be32(0) ++ be32(ts) ++ be32(dur) ++
            Array.fill[Byte](108 - 32)(0)
        else // v1: 64-bit times, timescale at +28, duration at +32
          be32(120) ++ "mvhd".getBytes("US-ASCII") ++ Array[Byte](1, 0, 0, 0) ++
            be32(0) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(ts) ++
            be32(0) ++ be32(dur) ++ Array.fill[Byte](120 - 40)(0)
      val moov = be32(8 + mvhd.length) ++ "moov".getBytes("US-ASCII") ++ mvhd
      ftyp ++ (0 until nJunk).flatMap(_ => junk).toArray ++ moov
    }
    val prop = Prop.forAll(
        Gen.chooseNum(1, 1000000), Gen.chooseNum(0, Int.MaxValue),
        Gen.oneOf(0, 1), Gen.chooseNum(0, 3), Gen.chooseNum(0, 40)) {
      (ts, dur, ver, nJunk, junkLen) =>
        functions.MediaHeaders.mp4Info(mp4(ts, dur, ver, nJunk, junkLen)).toSeq ==
          Seq(ts.toLong, dur.toLong, -1L) // headers only — no sample table
    }
    val bytesGen = Gen.chooseNum(0, 64)
      .flatMap(m => Gen.listOfN(m, Gen.chooseNum(-128, 127).map(_.toByte)))
    val garbageProp = Prop.forAll(bytesGen) { bs =>
      functions.MediaHeaders.mp4Info(bs.toArray); true
    }
    for ((p, name) <- Seq(prop -> "mp4", garbageProp -> "mp4-garbage")) {
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(500)
          .withInitialSeed(Seed(13L)), p)
      assert(res.passed, s"$name: ${res.status}")
    }
  }

  test("property (differential): MP4 stts walk round-trips constructed sample tables; truncations never throw") {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    def mp4(ts: Int, dur: Int, counts: List[Int], withAudioFirst: Boolean) = {
      def trak(handler: String, cs: List[Int]): Array[Byte] = {
        val hdlr = box("hdlr", be32(0) ++ be32(0) ++
          handler.getBytes("US-ASCII") ++ Array.fill[Byte](12)(0))
        val stts = box("stts", be32(0) ++ be32(cs.length) ++
          cs.toArray.flatMap(c => be32(c) ++ be32(1001)))
        box("trak", box("mdia", hdlr ++ box("minf", box("stbl", stts))))
      }
      val ftyp = be32(16) ++ "ftyp".getBytes("US-ASCII") ++
        "isom".getBytes("US-ASCII") ++ be32(0)
      val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
        be32(ts) ++ be32(dur) ++ Array.fill[Byte](108 - 32)(0))
      val tracks = (if (withAudioFirst) trak("soun", List(7)) else Array.emptyByteArray) ++
        trak("vide", counts)
      ftyp ++ box("moov", mvhd ++ tracks)
    }
    val countsGen = Gen.chooseNum(0, 12)
      .flatMap(m => Gen.listOfN(m, Gen.chooseNum(0, 100000)))
    val prop = Prop.forAll(
        Gen.chooseNum(1, 1000000), Gen.chooseNum(0, Int.MaxValue),
        countsGen, Gen.oneOf(true, false)) { (ts, dur, counts, audioFirst) =>
      functions.MediaHeaders.mp4Info(mp4(ts, dur, counts, audioFirst)).toSeq ==
        Seq(ts.toLong, dur.toLong, counts.map(_.toLong).sum)
    }
    // EVERY prefix truncation of a tracked movie must parse-or-null
    // without throwing, and a truncation that cuts into the sample
    // table must never fabricate a count larger than the true sum
    val full = mp4(90000, 90000, List(10, 20, 30), true)
    val truncProp = Prop.forAll(Gen.chooseNum(0, full.length)) { n =>
      val r = functions.MediaHeaders.mp4Info(full.take(n))
      r == null || r(2) <= 60L
    }
    for ((p, name) <- Seq(prop -> "stts", truncProp -> "stts-trunc")) {
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(500)
          .withInitialSeed(Seed(14L)), p)
      assert(res.passed, s"$name: ${res.status}")
    }
  }
}
