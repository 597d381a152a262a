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
}
