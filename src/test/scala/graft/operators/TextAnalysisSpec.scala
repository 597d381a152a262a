package graft.operators

import graft.SparkSpec

/** Targeted text-analysis invariants the DuckDB oracle cannot probe
  * (the driver testdata has no degenerate rows). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

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
