package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Invariants for the corpus-curation family (Curation.scala). The
  * DuckDB oracle pins exact values; these pin the semantic properties
  * that must survive refactors (partition-function totality, sample
  * determinism, chunk accounting, contamination recall). */
class CurationSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("hash split partitions every document exactly once, near the 80/10/10 target") {
    val total = Tables.documents(spark, dir).count()
    val splits = Curation.hashSplit(spark, dir)
      .select("split", "n_docs").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits.values.sum == total, "splits must partition the corpus")
    val trainFrac = splits("train").toDouble / total
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
  }

  test("hash split assignment is a pure function of doc_id (stable across sf dirs)") {
    // The same doc_id must land in the same split at every scale —
    // the property that lets a growing corpus keep historic splits.
    val a = Curation.hashSplit(spark, dir).collect()
    val b = Curation.hashSplit(spark, dir).collect()
    assert(a.sameElements(b))
  }

  test("dsirSelect ranks target-like candidates above dissimilar ones") {
    import spark.implicits._
    // Target (en) docs speak vocabulary A; candidate 100 speaks A,
    // candidate 200 speaks an unseen vocabulary B. The importance
    // weight is Σ ln(p_target/p_raw) per token — the A-speaker must
    // outscore the B-speaker, and the target slice itself must never
    // appear in the candidate output.
    val vocabA = "alpha beta gamma delta epsilon zeta"
    val vocabB = "xylophone quark zeppelin mammoth igloo vortex"
    val docs = (1L to 20L).map(id => (id, vocabA, "en")) ++ Seq(
      (100L, vocabA, "xx"), (200L, vocabB, "xx"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    docs.map { case (id, t, l) => (id, t, l, "srcD", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.dsirSelect(spark, dir)
      .select("doc_id", "dsir_logratio").as[(Long, Double)].collect()
    assert(out.map(_._1).toSet == Set(100L, 200L),
      s"only non-target docs are candidates: ${out.toSeq}")
    val byId = out.toMap
    assert(byId(100L) > byId(200L),
      s"target-vocabulary doc must outscore the stranger: ${out.toSeq}")
    assert(out.head._1 == 100L, "output is ordered by weight desc")
    graft.operators.Dedup.releaseIndexes(spark)
  }

  test("quota sample takes at most the quota per group and is deterministic") {
    val s1 = Curation.quotaSample(spark, dir).collect()
    val s2 = Curation.quotaSample(spark, dir).collect()
    assert(s1.sameElements(s2), "sample must be reproducible")
    val perGroup = s1.groupBy(_.getString(0)).map { case (_, rs) => rs.length }
    assert(perGroup.forall(_ <= Curation.QuotaPerGroup))
    // rn is dense 1..n within each group
    s1.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.sameElements(1 to rs.length))
    }
  }

  test("chunking accounts for every token exactly once") {
    val docTokens = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(trim(lower(col("text"))), "\\s+")).as("n"))
    val chunkSums = Curation.chunkDocs(spark, dir)
      .groupBy("doc_id").agg(sum("n_tokens").as("s"), count(lit(1)).as("c"))
    val joined = docTokens.join(chunkSums, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (n, s, c) = (r.getInt(1), r.getLong(2), r.getLong(3))
      assert(s == n, s"doc ${r.getLong(0)}: chunk tokens $s != doc tokens $n")
      assert(c == (n + Curation.ChunkTokens - 1) / Curation.ChunkTokens,
        s"doc ${r.getLong(0)}: $c chunks for $n tokens")
    }
  }

  test("PPS sample: exactly n probes land, heavy docs get multiple hits, integer-exact") {
    val out = Curation.ppsSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // systematic PPS places exactly n probes over the weight axis
    assert(out.map(_._3).sum == Curation.PpsSampleN)
    assert(out.forall(_._3 >= 1))
    // inclusion is weight-monotone in aggregate: the selected docs'
    // mean weight must exceed the corpus mean (that is what
    // probability-proportional-to-size means)
    val corpusMeanW = Tables.documents(spark, dir)
      .agg(avg(col("n_chars") + 1)).head.getDouble(0)
    val sampleMeanW = out.map(_._2).sum.toDouble / out.length
    assert(sampleMeanW > corpusMeanW,
      s"sample mean $sampleMeanW not above corpus mean $corpusMeanW")
    // determinism
    val again = Curation.ppsSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sameElements(again))
  }

  test("pack chunks: shards are contiguous, tokens fully accounted, budget respected") {
    val shards = Curation.packChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ids = shards.map(_._1)
    assert(ids.head == 0L && ids.sameElements(ids.min to ids.max),
      "shard ids must be contiguous from 0")
    val totalTokens = Curation.chunkDocs(spark, dir)
      .agg(sum(col("n_tokens"))).head.getLong(0)
    assert(shards.map(_._3).sum == totalTokens, "every token in exactly one shard")
    // a shard overfills only by the tail of one straddling chunk, so
    // its token count is bounded by budget + (max chunk - 1)
    val maxChunk = Curation.chunkDocs(spark, dir)
      .agg(max(col("n_tokens"))).head.getInt(0)
    assert(shards.forall(_._3 <= Curation.PackBudget + maxChunk - 1))
  }

  test("BPE pack chunks: same invariants in subword units, totals match the tokenizer") {
    val shards = Curation.packChunksBpe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ids = shards.map(_._1)
    assert(ids.head == 0L && ids.sameElements(ids.min to ids.max))
    // every BPE token of every non-empty doc lands in exactly one shard
    val totalBpe = TextAnalysis.bpeTokenCount(spark, dir)
      .agg(sum(col("bpe_tokens"))).head.getLong(0)
    assert(shards.map(_._3).sum == totalBpe,
      "packed totals must equal the tokenizer's corpus count")
    val maxChunk = Curation.chunkDocsBpe(spark, dir)
      .agg(max(col("n_tokens"))).head.getInt(0)
    assert(shards.forall(_._3 <= Curation.PackBudget + maxChunk - 1))
  }

  test("cumulative operators are layout-stable: a 7-file shuffle of the input moves nothing") {
    // PPS sampling and packing ride a global cumulative sum — the
    // ordering-sensitive shape. The block cumsum must make them a pure
    // function of the DATA, not of file/partition layout.
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    Tables.documents(spark, dir).repartition(7)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(Curation.ppsSample(spark, tmp).collect().toSeq ==
      Curation.ppsSample(spark, dir).collect().toSeq)
    assert(Curation.packChunks(spark, tmp).collect().toSeq ==
      Curation.packChunks(spark, dir).collect().toSeq)
  }

  test("decontamination flags every exact duplicate of an eval document") {
    // Any training doc whose text equals an eval doc's text shares all
    // its 8-grams — it must be flagged (docs here are all ≥ 8 tokens).
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("norm"))
    val ev = docs.filter(col("doc_id") % Curation.EvalModulus === 0)
      .select(col("norm"))
    val dupTrainIds = docs.filter(col("doc_id") % Curation.EvalModulus =!= 0)
      .join(ev, "norm").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val flagged = Curation.decontaminate(spark, dir)
      .select("train_id").collect().map(_.getLong(0)).toSet
    assert(dupTrainIds.subsetOf(flagged),
      s"unflagged exact dupes: ${dupTrainIds -- flagged}")
  }

  test("Bloom-pre-filtered decontamination: identical output, pre-shuffle might_contain, empty-eval safe") {
    // No false negatives + exact confirm join ⇒ bit-identical result.
    val exact = Curation.decontaminate(spark, dir).collect().map(_.toString).sorted.toSeq
    val bloomed = Curation.decontaminateBloom(spark, dir)
    assert(bloomed.collect().map(_.toString).sorted.toSeq == exact,
      "bloom variant must reproduce the exact operator bit-for-bit")
    // The scale claim is structural: the codegen might_contain
    // predicate prunes the train grams BEFORE the join (Catalyst's
    // own InjectRuntimeFilter declines this join — probed: the exact
    // variant's plan carries no bloom — so the operator must state it).
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "train side must be bloom-pruned in the physical plan")
    assert(!Curation.decontaminate(spark, dir).queryExecution.executedPlan
      .toString.contains("might_contain"),
      "probe invariant: Catalyst does not inject a runtime bloom here")
    // An eval side with no docs must yield the empty result, not an
    // NPE off the null aggregate row.
    val tmp = java.nio.file.Files.createTempDirectory("graft-bloom-empty").toString
    Tables.documents(spark, dir)
      .filter(col("doc_id") % Curation.EvalModulus =!= 0)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val empty = Curation.decontaminateBloom(spark, tmp)
    assert(empty.count() == 0, "no eval docs → no contamination")
    assert(empty.columns.toSeq == Seq("train_id", "n_shared", "n_eval_docs"))
  }

  test("profiler counts agree with direct aggregation") {
    val p = Curation.profileOrders(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val o = Tables.orders(spark, dir)
    val nRows = o.count()
    assert(p.values.forall(_.getLong(1) == nRows))
    val distinctStatus = o.select(countDistinct("o_orderstatus")).first().getLong(0)
    assert(p("o_orderstatus").getLong(3) == distinctStatus)
    // numeric columns carry min/max as double, strings as rendered text
    assert(!p("o_orderkey").isNullAt(4) && p("o_orderkey").isNullAt(6))
    assert(p("o_orderpriority").isNullAt(4) && !p("o_orderpriority").isNullAt(6))
  }

  test("corpus mix: quotas hit the integer targets, selection is lowest-hash-first") {
    import org.apache.spark.sql.functions.md5
    val out = Curation.corpusMix(spark, dir)
      .select("lang", "doc_id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val counts = Tables.documents(spark, dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = Curation.MixTargets.toMap
    // integer feasibility: the scarcest language binds
    val nStar = targets.collect { case (l, pct) if counts.contains(l) =>
      counts(l) * 100 / pct }.min
    val keep = out.groupBy(_._1).map { case (l, rs) => l -> rs.length.toLong }
    targets.foreach { case (l, pct) =>
      if (counts.contains(l)) assert(keep.getOrElse(l, 0L) == nStar * pct / 100,
        s"$l: kept ${keep.getOrElse(l, 0L)}, want ${nStar * pct / 100}")
    }
    assert(keep.keySet.subsetOf(targets.keySet), "untargeted languages dropped")
    // ranks are dense from 1 and selection is the hash-order prefix
    val hashes = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    out.groupBy(_._1).foreach { case (l, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length))
      val expect = hashes.filter(_._1 == l).sortBy(t => (t._3, t._2))
        .take(rs.length).map(_._2).toSet
      assert(rs.map(_._2).toSet == expect, s"$l selection is not the hash prefix")
    }
  }

  test("dup spans: merged 8-gram coverage, cross-doc and within-doc") {
    import spark.implicits._
    // docs 1/2 share a 10-token sentence behind distinct 4-token
    // prefixes: only the three 8-grams fully inside the shared region
    // are duplicated, and their merged span is exactly the 10 shared
    // positions. doc 3 is clean. doc 4 repeats its own 8 tokens —
    // within-doc repetition counts too, covering the whole doc.
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val rep = (1 to 8).map(i => s"r$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-spans").toString
    Seq(
      (1L, s"u1 u2 u3 u4 $shared"),
      (2L, s"w1 w2 w3 w4 $shared"),
      (3L, (1 to 12).map(i => s"c$i").mkString(" ")),
      (4L, s"$rep $rep"))
      .map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.dupSpans(spark, dir)
      .select("doc_id", "n_tokens", "dup_tokens", "dup_fraction")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 14L, 10L, 0.714286),
      (2L, 14L, 10L, 0.714286),
      (3L, 12L, 0L, 0.0),
      (4L, 16L, 16L, 1.0)))
    // apply side: covered positions removed, survivors rebuilt in order
    val applied = Curation.dupSpansApply(spark, dir)
      .select("doc_id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(applied == Seq(
      (1L, 10L, "u1 u2 u3 u4"),
      (2L, 10L, "w1 w2 w3 w4"),
      (3L, 0L, (1 to 12).map(i => s"c$i").mkString(" ")),
      (4L, 16L, "")))
    // keep-one-copy: the globally first occurrence survives — doc 1
    // keeps the shared sentence and doc 2 loses it; doc 4 keeps the
    // first of its two self-repeats
    val kept = Curation.dupSpansKeep(spark, dir)
      .select("doc_id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(kept == Seq(
      (1L, 0L, s"u1 u2 u3 u4 $shared"),
      (2L, 10L, "w1 w2 w3 w4"),
      (3L, 0L, (1 to 12).map(i => s"c$i").mkString(" ")),
      (4L, 8L, rep)))
  }

  test("token budget equals the naive global-order running sum") {
    // The distributed two-pass prefix sum must reproduce exactly what a
    // single-partition global window would: sort (ok-first, doc_id),
    // running-sum, keep while cum <= budget.
    val got = Curation.tokenBudget(spark, dir)
      .select("doc_id", "quality", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val all = TextAnalysis.qualityScore(spark, dir)
      .select("doc_id", "quality", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (if (t._2 == "ok") 0 else 1, t._1))
    val expected = all.scanLeft((0L, "", 0L, 0L)) {
      case ((_, _, _, cum), (id, q, n)) => (id, q, n, cum + n)
    }.drop(1).takeWhile(_._4 <= Curation.TokenBudget)
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty, "budget must admit at least one document")
    // boundary: the next document in order would not have fit
    val next = all.drop(got.length)
    next.headOption.foreach { case (_, _, n) =>
      assert(got.last._4 + n > Curation.TokenBudget,
        "selection must be maximal for the budget")
    }
  }
  test("bpe fertility: sums tie out against the per-doc token tables") {
    // The report must be an exact aggregate of the two tokenized-corpus
    // artifacts: cross-check one language's sums independently.
    val dir = sf("sf0.001")
    val rep = Curation.bpeFertility(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rep.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, dir)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(rep.keySet == langs, "one report row per language")
    rep.values.foreach { r =>
      assert(r.getDouble(5) > 0 && r.getDouble(6) > 0,
        s"ratios must be positive: $r")
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
    }
    // independent recomputation for 'en': whitespace tokens via SQL
    import org.apache.spark.sql.functions._
    val en = docs.filter(col("lang") === "en")
      .select(size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(rep("en").getLong(3) == en, "ws_tokens must equal the direct count")
  }

  test("leakage-safe split keeps every dup cluster inside one split") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lsplit").toString
    // one 21-member exact-dup cluster (ids 1 + 100..119 — md5 buckets of
    // these ids individually straddle train/val/test) + 19 singletons
    val dup = "the very same duplicated training document body here"
    val rows = (Seq(1L) ++ (100L to 119L)).map(id => (id, dup)) ++
      (200L to 218L).map(id => (id, s"unique doc $id with its own words ${id * 7}"))
    rows.map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.leakageSafeSplit(spark, dir).collect()
    // all 21 clustered docs land in exactly one split
    val clusteredBySplit = out.map(r => r.getString(0) -> r.getLong(4)).filter(_._2 > 0)
    assert(clusteredBySplit.map(_._2).sum === 21L, out.mkString(";"))
    assert(clusteredBySplit.length === 1,
      s"cluster straddles splits: ${clusteredBySplit.mkString(",")}")
    // naive per-doc split DOES scatter those same ids (the leakage this
    // operator exists to prevent) — sanity that the test is non-vacuous
    val naive = graft.sources.Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") <= 119L)
      .select(Curation.splitOf(org.apache.spark.sql.functions.col("doc_id")).as("s"))
      .distinct().count()
    assert(naive > 1, "planted ids no longer straddle the naive split buckets")
    // totals tie out
    assert(out.map(_.getLong(1)).sum === 40L)
  }

  test("temperature mix flattens the language distribution without reordering it") {
    val out = Curation.temperatureMix(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(out.length > 1)
    // shares are distributions (up to 6-dp rounding)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-4)
    // √-flattening COMPRESSES: the head language loses share, the tail
    // gains, and the relative ORDER of languages never changes
    val byN = out.sortBy(-_._2)
    assert(byN.head._4 < byN.head._3, "head language must lose share")
    assert(byN.last._4 > byN.last._3, "tail language must gain share")
    val rawOrder = out.sortBy(-_._3).map(_._1).toSeq
    val tmpOrder = out.sortBy(-_._4).map(_._1).toSeq
    assert(rawOrder === tmpOrder, "flattening must be monotone in the raw share")
    // quotas are feasible at the current corpus size
    val total = out.map(_._2).sum
    assert(out.map(_._5).sum <= total)
  }

  test("padding audit: buckets cover the corpus; bucketing strictly cuts padding waste") {
    val rows = Curation.paddingAudit(spark, sf("sf0.001"))
      .select("bucket", "n_docs", "cap", "max_tokens", "sum_tokens",
        "pad_ratio_bucketed", "pad_ratio_unbucketed")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.length > 1, "fixture corpus should span multiple length buckets")
    val gmax = rows.map(_._4).max
    rows.foreach { case (bucket, nDocs, cap, maxToks, sumToks, padB, padU) =>
      assert(cap == (1L << bucket))
      assert(maxToks < cap && maxToks >= cap / 2, "bucket bounds broken")
      assert(sumToks <= nDocs * maxToks && sumToks >= nDocs * (cap / 2))
      // padding to the global max can never beat padding to the
      // bucket's own max (max_tokens <= gmax)
      assert(padB <= padU + 1e-9, s"bucket $bucket: bucketed $padB > unbucketed $padU")
    }
    // the audit's point: aggregate bucketed waste is strictly below
    // pad-everything-to-global-max waste on a multi-bucket corpus
    val wasteB = rows.map(r => r._2 * r._4 - r._5).sum
    val wasteU = rows.map(r => r._2 * gmax - r._5).sum
    assert(wasteB < wasteU, s"bucketing saved nothing: $wasteB vs $wasteU")
  }
}
