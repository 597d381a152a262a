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

  test("train: planted histogram learns the expected merge cascade, deterministically") {
    // "the" dominates: (t,h) and (h,e) tie at 60, the lexicographic
    // tie-break picks (h,e), then (t,he) completes the cascade — and
    // "the" must encode to ONE token under the learned table
    val hist = Seq(("the", 50L), ("then", 10L), ("tx", 3L), ("zq", 1L))
    val merges = Bpe.train(hist, 4)
    assert(merges.take(2) == Seq(("h", "e"), ("t", "he")),
      s"expected the he-cascade first, got $merges")
    val enc = Bpe.computeWith(UTF8String.fromString("the"), merges.toArray)
      .array.toSeq.map(_.asInstanceOf[UTF8String].toString)
    assert(enc == Seq("the"), s"'the' must collapse to one token, got $enc")
    // byte-for-byte determinism across invocations
    assert(Bpe.train(hist, 4) == merges)
    // and a permuted histogram learns the identical table (training is
    // a function of the multiset, not the row order)
    assert(Bpe.train(hist.reverse, 4) == merges)
  }

  test("train: pair counts are weighted and non-overlapping; singleton pairs stop training") {
    // "aaa"×3 holds ONE (a,a) per word (non-overlapping) = 3 total;
    // "bc"×2 holds (b,c) = 2. (a,a) wins 3 > 2.
    val merges = Bpe.train(Seq(("aaa", 3L), ("bc", 2L)), 10)
    assert(merges.head == ("a", "a"), s"got $merges")
    // after (a,a): "aaa" → [aa, a]; (aa,a) freq 3 beats (b,c) 2
    assert(merges.take(3) == Seq(("a", "a"), ("aa", "a"), ("b", "c")), s"got $merges")
    // no pair repeats after that → training stops early at 3 merges
    assert(merges.length == 3, s"expected early stop, got $merges")
  }

  test("train + encodeWith round-trip: learned table collapses the planted vocabulary") {
    val merges = Bpe.train(Seq(("table", 20L), ("tab", 5L)), 8).toArray
    val out = Bpe.computeWith(UTF8String.fromString("table tab"), merges)
    val toksOut = out.array.toSeq.map(_.asInstanceOf[UTF8String].toString)
    // "table" fully collapses (it dominates the histogram); "tab" is a
    // prefix of the cascade so it collapses too
    assert(toksOut.contains("table") && toksOut.length <= 3, s"got $toksOut")
  }

  test("fitMerges is deterministic per corpus and the fit query serves it") {
    val dir = sf("sf0.001")
    val m1 = graft.operators.BpeFit.fitMerges(spark, dir)
    val m2 = graft.operators.BpeFit.fitMerges(spark, dir)
    assert(m1.nonEmpty && m1 == m2)
    // learned cascades must be buildable (same well-formedness invariant
    // as the fixed table): every rule's inputs are single chars or an
    // EARLIER rule's output
    val known = scala.collection.mutable.Set.empty[String]
    m1.foreach { case (a, b) =>
      assert(a.length == 1 || known.contains(a), s"orphan left input $a")
      assert(b.length == 1 || known.contains(b), s"orphan right input $b")
      known += (a + b)
    }
    val fitCounts = graft.operators.BpeFit.bpeTokenCountFit(spark, dir)
    assert(fitCounts.count() > 0)
    // the learned tokenizer compresses at least as well as characters
    // and no better than whole words on every doc
    import spark.implicits._
    val bad = fitCounts.join(
        spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"),
          length(col("text")).as("n_chars_x")), "doc_id")
      .filter(col("bpe_tokens_fit") > col("n_chars_x"))
    assert(bad.count() == 0)
  }
}
