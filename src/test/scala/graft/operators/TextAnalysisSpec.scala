package graft.operators

import graft.SparkSpec

/** Targeted text-analysis invariants the DuckDB oracle cannot probe
  * (the driver testdata has no degenerate rows). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("perplexity score: hand-computed unigram cross-entropy, common beats rare") {
    // Corpus: d1 = four copies of the common token, d2 = four hapaxes.
    // Counts a:4, b..e:1 each, total 8 → ce(d1) = ln 2, ce(d2) = ln 8.
    val dir = java.nio.file.Files.createTempDirectory("graft-ppl").toString
    Seq((1L, "a a a a"), (2L, "b c d e"))
      .map { case (id, t) => (id, t, "en", "srcT", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.perplexityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 4 && out(2L)._1 == 4)
    assert(math.abs(out(1L)._2 - math.log(2)) < 1e-5, s"ce(d1)=${out(1L)._2}")
    assert(math.abs(out(2L)._2 - math.log(8)) < 1e-5, s"ce(d2)=${out(2L)._2}")
    assert(out(1L)._2 < out(2L)._2,
      "a document of corpus-common tokens must score below a rare-token one")
  }

  test("textStats keeps an audit row with NULL stats for a NULL-text document") {
    // The oracle's NULL propagation emits a row with NULL stats for a
    // null text; a plain explode would silently drop the doc — lost
    // audit rows the moment dirty data enters the corpus.
    val dir = java.nio.file.Files.createTempDirectory("graft-nulltext").toString
    Seq(
      (1L, Option("three short tokens"), "en", "srcT", 18L),
      (2L, Option.empty[String], "en", "srcT", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.textStats(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L), "both docs must appear")
    val r1 = out(0)
    assert(r1.getLong(2) == 3L && r1.getLong(3) == 3L)
    val r2 = out(1)
    assert(r2.isNullAt(1) && r2.isNullAt(2) && r2.isNullAt(3) &&
      r2.isNullAt(4) && r2.isNullAt(5),
      s"null-text doc must carry NULL stats, got $r2")
  }

  test("gopherQuality: planted rule violations each trip exactly their rule") {
    // One doc per rule violation plus one clean doc — each flag must
    // fire independently and `pass` must be their conjunction.
    val clean = (("the of and that have with " * 10) +
      ("alpha beta gamma delta " * 10)).trim             // 100 words, all rules ok
    val tooShort = "the of and that have with words"     // 7 words < 50
    val longWords = ("antidisestablishment " * 60).trim + " the of" // mean len > 10
    val symbols = (("### " * 30) + ("the of and " * 10)).trim // 30 '#'-words / 60 words > 0.1
    val numeric = (("123 456 " * 40) + "the of and ").trim    // alpha frac < 0.8
    val noStop = ("alpha beta gamma delta " * 15).trim        // 0 stopword hits
    val dir = java.nio.file.Files.createTempDirectory("graft-gopher").toString
    Seq((1L, clean), (2L, tooShort), (3L, longWords), (4L, symbols),
      (5L, numeric), (6L, noStop))
      .map { case (id, t) => (id, t, "en", "srcG", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.gopherQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def rules(id: Long): Seq[Int] =
      (6 to 10).map(i => out(id).getInt(i)) // word_count, mean_len, symbol, alpha, stop
    assert(rules(1L) == Seq(1, 1, 1, 1, 1) && out(1L).getInt(11) == 1,
      s"clean doc must pass all: ${out(1L)}")
    assert(rules(2L)(0) == 0, s"short doc must fail word count: ${out(2L)}")
    assert(rules(3L)(1) == 0, s"long-word doc must fail mean length: ${out(3L)}")
    assert(rules(4L)(2) == 0, s"symbol doc must fail symbol ratio: ${out(4L)}")
    assert(rules(5L)(3) == 0, s"numeric doc must fail alpha fraction: ${out(5L)}")
    assert(rules(6L)(4) == 0, s"stopword-free doc must fail stop rule: ${out(6L)}")
    Seq(2L, 3L, 4L, 5L, 6L).foreach(id =>
      assert(out(id).getInt(11) == 0, s"doc $id must fail composite: ${out(id)}"))
  }

  test("bm25: hand-computed scores on a planted corpus, rare-term match outranks") {
    // Four docs of equal length dl = 4 = avgdl, so the length norm is
    // exactly 1 and score = Σ idf(df)·tf·2.2/(tf + 1.2). The length≥6
    // query terms are albatross (df 3), barnacle (df 3), castle6 (df 1)
    // — castle6's rarity gives d4 the top rank despite fewer matches.
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    Seq(
      (1L, "albatross albatross barnacle x"),
      (2L, "albatross barnacle y z"),
      (3L, "albatross q r s"),
      (4L, "barnacle castle6 t u"))
      .map { case (id, t) => (id, t, "en", "srcB", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def idf(df: Int): Double = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
    def w(tf: Int, df: Int): Double = idf(df) * tf * 2.2 / (tf + 1.2)
    val expect = Map(
      1L -> (2L, w(2, 3) + w(1, 3)),
      2L -> (2L, w(1, 3) + w(1, 3)),
      3L -> (1L, w(1, 3)),
      4L -> (2L, w(1, 3) + w(1, 1)))
    val out = TextAnalysis.bm25Search(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(4L, 1L, 2L, 3L),
      "rank order must follow the hand-computed scores")
    out.foreach { r =>
      val (n, s) = expect(r.getLong(0))
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) - s) < 1e-5, s"score mismatch: $r vs $s")
    }
  }
  test("source quality: a short-doc feed reports its lowered ok share") {
    // srcGood: two ok docs; srcBad: one ok + one too_short.
    val dir = java.nio.file.Files.createTempDirectory("graft-srcq").toString
    val ok = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (1L, ok, "srcGood"), (2L, ok + " more words here", "srcGood"),
      (3L, ok, "srcBad"), (4L, "too short", "srcBad"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.sourceQuality(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("srcGood") === ((2L, 2L, 1.0)))
    assert(out("srcBad") === ((2L, 1L, 0.5)))
  }

  test("TextRank keywords: single-token and empty documents are skipped, not an ANSI crash") {
    val dir = java.nio.file.Files.createTempDirectory("graft-trank1").toString
    Seq((1L, "solo"), (2L, ""), (3L, "alpha beta alpha beta gamma"))
      .map { case (id, t) => (id, t, "en", "srcT", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // under ANSI mode an unguarded element_at(toks, 2) on the 1-token
    // docs would throw INVALID_ARRAY_INDEX before any filter ran
    val out = TextAnalysis.textrankKeywords(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet === Set("alpha", "beta", "gamma"))
  }

  test("TextRank keywords: hub word outranks satellites; stopwords/short words excluded") {
    // 'engine' co-occurs with every content word (hub of the word
    // graph); 'the' and 2-char tokens must never appear
    val dir = java.nio.file.Files.createTempDirectory("graft-trank").toString
    val docs = Seq(
      (1L, "engine speed the engine torque an engine power xy engine"),
      (2L, "engine speed engine torque engine power"),
      (3L, "speed torque the power xy"))
    docs.map { case (id, t) => (id, t, "en", "srcT", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.textrankKeywords(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(out.nonEmpty && out.head._1 === "engine", out.toSeq)
    assert(out.forall(_._2 > 0))
    // rank order is non-increasing (presentation contract)
    assert(out.map(_._2).sliding(2).forall(p => p.head >= p.last))
    val words = out.map(_._1).toSet
    assert(!words.contains("the") && !words.contains("an") && !words.contains("xy"),
      s"stoplist/short-word leak: $words")
  }

  test("NB distillation: separable corpus classifies 100%, prior-only for null text") {
    // 4 Gopher-pass docs (60 words, clean vocabulary incl. 2+ Gopher
    // stopwords) vs 6 reject docs (3 junk words — fails word count and
    // mean word length). Vocabularies are disjoint except the shared
    // stopwords, so the distilled model must separate perfectly.
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    val passText = Array.fill(6)("the be to of and that have with good clean").mkString(" ")
    val docs =
      (1L to 4L).map(id => (id, Option(passText))) ++
        (5L to 10L).map(id => (id, Option("zz qq ww"))) ++
        Seq((11L, Option.empty[String])) // prior-only path
    docs.map { case (id, t) => (id, t, "en", "srcT", t.map(_.length.toLong).getOrElse(0L)) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val model = TextAnalysis.nbQualityModel(spark, dir).collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // class-exclusive terms separate with the right signs
    assert(model(Some("good"))._3 > 0, s"pass-only term llr: ${model(Some("good"))}")
    assert(model(Some("zz"))._3 < 0, s"reject-only term llr: ${model(Some("zz"))}")
    // the NULL-term prior row carries the doc counts (4 pass, 7 reject
    // — the null-text doc has no Gopher stats, so the teacher rejects)
    val (nPass, nReject, prior) = model(None)
    assert(nPass == 4L && nReject == 7L, s"prior doc counts: $nPass/$nReject")
    assert(math.abs(prior - math.log(5.0 / 8.0)) < 1e-6)
    val out = TextAnalysis.nbQualityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2), r.getString(3), r.getBoolean(4)))
      .toMap
    assert(out.size == 11)
    (1L to 4L).foreach(id => assert(out(id)._2 == "pass" && out(id)._4, s"$id: ${out(id)}"))
    (5L to 10L).foreach(id => assert(out(id)._2 == "reject" && out(id)._4, s"$id: ${out(id)}"))
    // null text: no in-vocab tokens -> score = the prior alone
    assert(math.abs(out(11L)._1 - BigDecimal(prior).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"prior-only: ${out(11L)}")
    // the confusion table sums to the corpus and the separable corpus
    // has no off-diagonal pass/reject leakage
    val rep = TextAnalysis.nbDistillReport(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // 7 = the 6 junk docs + the null-text doc: its teacher verdict is
    // reject (no Gopher stats) and its prior-only score ln(5/8) < 0
    // predicts reject too — the class balance happens to agree
    assert(rep(("pass", "pass")) == 4L && rep(("reject", "reject")) == 7L)
    assert(rep.getOrElse(("pass", "reject"), 0L) == 0L)
    assert(rep.values.sum == 11L)
    // discriminative-terms report: the vocabulary is only 13 terms, so
    // both top-20 sides contain all of it — assert the EXTREMES: the
    // strongest pass-indicative term is clean vocabulary, the
    // strongest reject-indicative term is junk
    val terms = TextAnalysis.nbTopTerms(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(4)))
    val passSide = terms.filter(_._1 == "pass_indicative")
    val rejectSide = terms.filter(_._1 == "reject_indicative")
    assert(passSide.nonEmpty && rejectSide.nonEmpty)
    val junk = Set("zz", "qq", "ww")
    val topPass = passSide.maxBy(_._3)
    val topReject = rejectSide.minBy(_._3)
    assert(!junk(topPass._2) && topPass._3 > 0, s"top pass term: $topPass")
    assert(junk(topReject._2) && topReject._3 < 0, s"top reject term: $topReject")
  }
}
