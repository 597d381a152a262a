package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import scala.util.Random

/** BPE tokenizer pins: cross-formulation differential (rank-order
  * exhaustive folds vs the GPT-2-style min-rank-pair loop — two
  * independent encodings of the same canonical BPE semantics), edge
  * cases, and the DataFrame/codegen path. */
class BpeSpec extends SparkSpec {

  private def toks(s: String): Seq[String] = {
    val r = Bpe.compute(UTF8String.fromString(s))
    if (r == null) null
    else r.array.toSeq.map(_.asInstanceOf[UTF8String].toString)
  }

  /** Independent formulation: repeatedly find the LOWEST-RANK merge
    * pair present anywhere in the word and merge its leftmost
    * occurrence, until no ranked pair remains. Equivalent to the
    * kernel's rank-order exhaustive folds for any valid merge table
    * (a merge output only feeds later-ranked merges). */
  private def encodeMinRank(word: String): Seq[String] = {
    val rank = Bpe.Merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    var t = word.map(_.toString).toVector
    var done = false
    while (!done && t.length > 1) {
      val pairs = t.indices.dropRight(1).map(i => (t(i), t(i + 1)))
      val ranked = pairs.zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
      if (ranked.isEmpty) done = true
      else {
        val (r, i) = ranked.minBy { case (rr, ii) => (rr, ii) }
        val (a, b) = Bpe.Merges(r)
        t = (t.take(i) :+ (a + b)) ++ t.drop(i + 2)
      }
    }
    t
  }

  test("merge table is well-formed: every input is a char or an EARLIER rule's output") {
    // The confluence argument (rank-order exhaustive folds == min-rank
    // loop == the oracle's replace passes) needs: no duplicate rules,
    // no duplicate outputs, and every multi-char input produced by a
    // strictly earlier rule — a future merge-table edit that violates
    // this would silently change semantics between formulations.
    val rules = Bpe.Merges
    assert(rules.distinct.length == rules.length, "duplicate merge rules")
    val outputs = rules.map { case (a, b) => a + b }
    assert(outputs.distinct.length == outputs.length, "duplicate outputs")
    rules.zipWithIndex.foreach { case ((a, b), i) =>
      val earlier = outputs.take(i).toSet
      Seq(a, b).filter(_.length > 1).foreach { t =>
        assert(earlier(t),
          s"rule $i input '$t' is multi-char but not an earlier rule's output")
      }
    }
  }

  test("differential: rank-order folds == min-rank loop on corpus-like words") {
    val vocab = Seq("table", "value", "spark", "part", "hash", "scan", "fast",
      "row", "key", "merge", "batch", "sort", "line", "window", "slow", "the",
      "agg", "a", "stable", "tables", "sparkle", "keyed", "resort", "inline")
    val rnd = new Random(7)
    val randomWords = Seq.fill(200)(
      (0 until (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    (vocab ++ randomWords).foreach { w =>
      assert(toks(w) == encodeMinRank(w), s"word: $w")
    }
  }

  test("vocabulary words collapse through multi-step cascades") {
    assert(toks("table") == Seq("table"))
    assert(toks("value") == Seq("value"))
    assert(toks("spark") == Seq("spark"))
    assert(toks("window") == Seq("window"))
    assert(toks("the quick table") == Seq("the", "q", "u", "i", "c", "k", "table"))
  }

  test("edge cases: null, empty, whitespace, sentinel, case folding") {
    assert(toks(null) == null)
    assert(toks("") == Seq.empty)
    assert(toks("   \t\n ") == Seq.empty)
    assert(toks("TABLE Table table") == Seq("table", "table", "table"))
    assert(toks("ta\u001fble") == Seq("table"))
    assert(toks("  table   value  ") == Seq("table", "value"))
  }

  test("merges never cross word boundaries") {
    // "t a" would merge to "ta" in one word; across words it must not
    assert(toks("t a") == Seq("t", "a"))
    assert(toks("tabl e") == Seq("tabl", "e"))
  }

  test("DataFrame path under codegen: counts match the kernel") {
    import spark.implicits._
    val df = Seq((1L, "the table value"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
      .select(col("doc_id"), BpeTokenizeColumn(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n"))
      .orderBy("doc_id")
    assert(df.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -99 else r.getInt(1))).toSeq ==
      Seq((1L, 3), (2L, 0), (3L, -99)))
  }

  test("chunkDocsBpe windows tile the per-doc token counts exactly") {
    val dir = sf("sf0.001")
    val chunks = graft.operators.Curation.chunkDocsBpe(spark, dir)
      .groupBy("doc_id").agg(sum("n_tokens").as("n"))
    val counts = graft.operators.TextAnalysis.bpeTokenCount(spark, dir)
      .select(col("doc_id"), col("bpe_tokens").as("n2"))
    val joined = chunks.join(counts, "doc_id")
      .filter(col("n") =!= col("n2"))
    assert(joined.count() == 0)
  }
}
