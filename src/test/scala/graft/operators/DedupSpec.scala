package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins the semantics of the approximate dedup operators (MinHash/LSH,
  * SimHash) that the DuckDB oracle cannot check, plus exact-dedup and
  * Jaccard behavior on constructed fixtures with known overlap.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Write a fixture documents table (driver testdata schema) and
    * return its directory. */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    rows.map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exactDedup collapses case/whitespace variants to the lowest doc_id") {
    val dir = docsDir(Seq(
      (1L, "Hello  World"),
      (2L, "hello world"),
      (3L, "  HELLO\tWORLD "),
      (4L, "something else")))
    val out = Dedup.exactDedup(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (4L, 1L)))
  }

  test("jaccardPairs ranks a constructed near-dup pair first with the hand-computed score") {
    // A and B: 12 tokens, differ in the last token → 10 shingles each,
    // 9 shared → jaccard = 9 / (10 + 10 - 9) = 9/11.
    val base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val dir = docsDir(Seq(
      (1L, s"$base end1"),
      (2L, s"$base end2"),
      (3L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11")))
    val top = Dedup.jaccardPairs(spark, dir)
      .select("id_a", "id_b", "n_common", "jaccard")
      .as[(Long, Long, Long, Double)].collect().head
    assert(top._1 == 1L && top._2 == 2L && top._3 == 9L)
    assert(math.abs(top._4 - 9.0 / 11.0) < 1e-12)
  }

  test("dedupClusters is transitive: A~B~C clusters together even when A is not ~C") {
    // 12 shared middle tokens; A and C each diverge by 2 tokens on
    // opposite ends: jaccard(A,B) = jaccard(B,C) = 10/12 ≥ 0.8 but
    // jaccard(A,C) = 10/14 < 0.8 — only transitive closure puts all
    // three in one cluster. Docs 10/11 are exact duplicates (their own
    // cluster); doc 20 touches no pair and must not appear.
    val mid = (1 to 12).map(i => s"m$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, s"$mid a1 a2"),
      (2L, mid),
      (3L, s"c1 c2 $mid"),
      (10L, "some exact duplicate text right here"),
      (11L, "some exact duplicate text right here"),
      (20L, "an unrelated document about nothing shared at all")))
    val out = Dedup.dedupClusters(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("clusterCanonical keeps the quality winner, not the lowest id") {
    // A (id 1) and B (id 2) are near-dups: 12 shared tokens; A carries
    // a 24-char punctuation token (punct_ratio ≈ 0.4 → too_punct)
    // while B adds a clean 13th token (quality ok). Both have 13
    // tokens, so a (n_tokens, doc_id) ranking alone would keep A —
    // only the quality tier puts B first. Shingle overlap: 11 each,
    // 10 shared → jaccard 10/12 ≥ 0.8. Docs 10/11 are exact dups with
    // identical text (equal quality/length), so the tie-break keeps
    // the lower id. Doc 20 is clean and unclustered — absent.
    val mid = (1 to 12).map(i => s"m$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, s"$mid !!!!!!!!!!!!!!!!!!!!!!!!"),
      (2L, s"$mid m13"),
      (10L, "some exact duplicate text right here now ok fine"),
      (11L, "some exact duplicate text right here now ok fine"),
      (20L, "an unrelated clean document about nothing shared at all")))
    val out = Dedup.clusterCanonical(spark, dir)
      .select("doc_id", "component", "quality", "keep_id", "action")
      .as[(Long, Long, String, Long, String)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 10L, 11L))
    val byDoc = out.map(r => r._1 -> r).toMap
    assert(byDoc(1L)._3 == "too_punct" && byDoc(2L)._3 == "ok")
    assert(byDoc(1L)._4 == 2L && byDoc(2L)._4 == 2L)
    assert(byDoc(1L)._5 == "drop" && byDoc(2L)._5 == "keep")
    assert(byDoc(10L)._4 == 10L && byDoc(10L)._5 == "keep")
    assert(byDoc(11L)._4 == 10L && byDoc(11L)._5 == "drop")
    // exactly one keep per component
    val keeps = out.groupBy(_._2).map { case (_, rs) => rs.count(_._5 == "keep") }
    assert(keeps.forall(_ == 1))
  }

  test("incremental dedup matches new-batch docs against the corpus only") {
    // ids ≡ 9 (mod 10) are the "new batch". Docs 19 and 29 are
    // near-variants of corpus doc 3 → each must match 3. Corpus pair
    // (1,2) and new-new pair (19,29) must NEVER appear, and the clean
    // new doc 9 has no match row.
    val baseA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val baseB = "one two three four five six seven eight nine ten eleven twelve"
    val dir = docsDir(Seq(
      (1L, baseB),
      (2L, baseB.replace("six", "SIX")),
      (3L, baseA),
      (9L, "a totally unrelated clean new document with nothing shared"),
      (19L, baseA.replace("zeta", "ZETA")),
      (29L, baseA.replace("iota", "IOTA"))))
    val out = Dedup.incrementalNearDups(spark, dir)
      .select("new_id", "match_id", "jaccard", "rn")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(out.map(r => (r._1, r._2)).toSet == Set((19L, 3L), (29L, 3L)))
    assert(out.forall(r => r._3 >= 0.5 && r._4 == 1))
  }

  test("watermark-window incremental dedup agrees with the modulus variant on a shared batch") {
    // A corpus where BOTH batch definitions select the same docs: old
    // corpus ids avoid ≡9 (mod 10) and sit at/below the stored mark
    // 100; the new batch ids 109/119/129 are ≡9 (mod 10) AND inside
    // the watermark window (100, 130]. The oracle-paired registered
    // query runs the watermark variant — this pins that it computes
    // the same incremental semantics as the long-standing modulus demo
    // when the batch memberships coincide.
    val baseA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val baseB = "one two three four five six seven eight nine ten eleven twelve"
    val dir = docsDir(Seq(
      (1L, baseB),
      (2L, baseB.replace("six", "SIX")),
      (3L, baseA),
      (109L, "a totally unrelated clean new document with nothing shared"),
      (119L, baseA.replace("zeta", "ZETA")),
      (129L, baseA.replace("iota", "IOTA"))))
    val byModulus = Dedup.incrementalNearDups(spark, dir)
      .select("new_id", "match_id", "n_common", "jaccard", "rn")
      .as[(Long, Long, Long, Double, Int)].collect().toSeq.sorted
    val byWatermark = Dedup.incrementalNearDupsSince(spark, dir, lo = 100L, hi = 130L)
      .select("new_id", "match_id", "n_common", "jaccard", "rn")
      .as[(Long, Long, Long, Double, Int)].collect().toSeq.sorted
    assert(byWatermark == byModulus,
      s"watermark and modulus variants must agree: $byWatermark vs $byModulus")
    assert(byWatermark.map(r => (r._1, r._2)).toSet == Set((119L, 3L), (129L, 3L)))
  }

  test("edit-distance hot block is capped at MaxEditBlock lowest ids") {
    // 300 docs share (lang, 2-char prefix, length bucket) — uncapped,
    // this block alone is C(300,2) = 44850 quadratic DP pairs and
    // grows without bound on boilerplate corpora. The cap must keep
    // exactly the 256 lowest doc_ids (deterministic truncation →
    // C(256,2) pairs), and a same-prefix doc in a DIFFERENT length
    // bucket must not pair with the block at all.
    val hot = (0 until 300).map { i =>
      (i.toLong, f"thdoc$i%03d padding tokens x")  // constant length → one bucket
    }
    val dir = docsDir(hot :+ (1000L, "th" + "z" * 100))
    val cands = Dedup.editCandidates(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val cap = Dedup.MaxEditBlock
    assert(cands.length == cap * (cap - 1) / 2,
      s"expected C($cap,2) pairs, got ${cands.length}")
    val ids = cands.flatMap(r => Seq(r._1, r._2)).toSet
    assert(ids == (0L until cap.toLong).toSet,
      "cap must keep the lowest doc_ids and exclude the long-doc bucket")
  }

  test("star branch connects a template cluster larger than MaxShingleDf") {
    // 80 near-identical docs (> MaxShingleDf = 64): every SHARED
    // shingle has df = 80, so the all-pairs branch sees none of them —
    // the pre-round-4 df cap dropped this cluster entirely (zero
    // candidate pairs despite true jaccard ≈ 0.93). The star branch
    // must link every doc to the group minimum with the EXACT
    // intersection score, and the transitive clustering must close the
    // component. 31 tokens → 29 distinct shingles, 28 shared →
    // jaccard = 28 / (29 + 29 - 28) = 28/30.
    val n = 80
    val base = (1 to 30).map(i => s"t$i").mkString(" ")
    val dir = docsDir((0 until n).map(i => (i.toLong, s"$base u$i")))
    val clusters = Dedup.dedupClusters(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(clusters.size == n)
    assert(clusters.forall { case (_, comp, sz) => comp == 0L && sz == n.toLong })
    val top = Dedup.jaccardPairs(spark, dir)
      .select("id_a", "id_b", "n_common", "jaccard")
      .as[(Long, Long, Long, Double)].collect().head
    assert(top._1 == 0L && top._3 == 28L)
    assert(math.abs(top._4 - 28.0 / 30.0) < 1e-12)
  }

  /** Driver-side union-find — the differential oracle for the
    * distributed connected-components kernel. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // min id per set: roots chosen by min-merge above already are the
    // set minimum, but normalize defensively
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val df = edges.toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(df)
    (labels.as[(Long, Long)].collect().toMap, rounds)
  }

  test("connectedComponents matches driver-side union-find on seeded random graphs") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 8).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val edges = (0 until (n * 3 / 2)).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val (got, _) = ccOf(edges)
      assert(got == unionFind(edges), s"trial $trial diverged from union-find")
    }
  }

  test("connectedComponents: 200-node path converges in O(log n) rounds, not O(diameter)") {
    // the adversarial shape for min-label propagation: a chain needs
    // one round per hop (~200); alternating stars must stay well under
    // 20 and still label every node with the chain minimum
    val path = (0L until 199L).map(i => (i, i + 1))
    val (labels, rounds) = ccOf(path)
    assert(labels.size == 200 && labels.values.forall(_ == 0L))
    assert(rounds < 20, s"took $rounds rounds — not the O(log n) kernel")
  }

  test("connectedComponents: stars and singleton pairs are already stable") {
    val edges = Seq((5L, 1L), (1L, 9L), (1L, 7L), (100L, 200L))
    val (labels, rounds) = ccOf(edges)
    assert(labels == Map(1L -> 1L, 5L -> 1L, 7L -> 1L, 9L -> 1L,
      100L -> 100L, 200L -> 100L))
    assert(rounds <= 2)
  }

  test("minhash estimate: exact 1.0 for identical docs, near true jaccard otherwise") {
    // doc1 == doc2; doc3 shares roughly half its shingles with doc1.
    val shared = (0 until 20).map(i => s"s$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, shared + " " + (0 until 18).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + (0 until 18).map(i => s"a$i").mkString(" ")),
      (3L, shared + " " + (0 until 18).map(i => s"b$i").mkString(" "))))
    val out = Dedup.minhashLsh(spark, dir)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) == 1.0)
    // true jaccard(1,3): 38-token docs share the 20 shared tokens' 18
    // interior shingles + boundary effects; estimate must land within
    // the k=32 sampling error of the exact value.
    val exact = Dedup.jaccardPairs(spark, dir)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(out((1L, 3L)) - exact((1L, 3L))) < 0.3)
  }

  test("minhashCandidates with wide bands still pairs identical docs") {
    val dir = docsDir(Seq(
      (1L, "x0 x1 x2 x3 x4 x5 x6 x7"),
      (2L, "x0 x1 x2 x3 x4 x5 x6 x7"),
      (3L, "y0 y1 y2 y3 y4 y5 y6 y7")))
    val sigs = graft.sources.Tables.documents(spark, dir)
      .selectExpr("doc_id", "text")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        Dedup.minhashSignature(Dedup.shingleHashes(
          org.apache.spark.sql.functions.array_distinct(
            org.apache.spark.sql.functions.split(
              org.apache.spark.sql.functions.col("text"), " ")))).as("sig"))
    val cands = Dedup.minhashCandidates(sigs, bandRows = 4)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 3L)))
  }

  test("minhash banding at r=2 recalls every planted near-dup pair") {
    import org.apache.spark.sql.functions.{array_distinct, col, split}
    // 10 planted pairs (2i, 2i+1): 30 tokens, last token differs →
    // 28 shingles each, 27 shared → jaccard = 27/29 ≈ 0.93. At 16
    // bands of r=2, P(miss) = (1-j²)^16 ≈ 2e-9 per pair. 10 noise
    // docs with disjoint vocab must NOT pair with anything.
    val planted = (0 until 10).flatMap { i =>
      val base = (0 until 29).map(t => s"p${i}t$t").mkString(" ")
      Seq((2L * i, s"$base endA"), (2L * i + 1, s"$base endB"))
    }
    val noise = (0 until 10).map { i =>
      (100L + i, (0 until 30).map(t => s"n${i}x$t").mkString(" "))
    }
    val dir = docsDir(planted ++ noise)
    val sigs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingleHashes(
          array_distinct(split(col("text"), " ")))).as("sig"))
    val cands = Dedup.minhashCandidates(sigs, bandRows = 2)
      .as[(Long, Long)].collect().toSet
    (0 until 10).foreach { i =>
      assert(cands.contains((2L * i, 2L * i + 1)), s"planted pair $i missed")
    }
    assert(!cands.exists { case (a, b) => a >= 100L || b >= 100L },
      "noise docs must not become candidates")
  }

  test("simhash: hamming 0 for identical docs, large for disjoint vocab") {
    val dir = docsDir(Seq(
      (1L, "m0 m1 m2 m3 m4 m5 m6 m7 m8 m9"),
      (2L, "m0 m1 m2 m3 m4 m5 m6 m7 m8 m9"),
      (3L, "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9")))
    val out = Dedup.simhashPairs(spark, dir)
      .as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) == 0)
    // disjoint-vocab pairs only appear if a 16-bit chunk collides; if
    // they do, their distance must be well away from 0.
    out.get((1L, 3L)).foreach(d => assert(d > 5))
  }

  test("differential: per-row simhashBits equals the aggregate simhashTable formulation") {
    import org.apache.spark.sql.functions.{col, split, trim, lower}
    val dir = docsDir(Seq(
      (1L, "m0 m1 m2 m3 m4 m5 m6 m7 m8 m9"),
      (2L, "z0 z1 z2 z3 z4 z5 m0 m1"),
      (3L, "solo")))
    val viaLambda = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        Dedup.simhashBits(split(trim(lower(col("text"))), "\\s+")).as("bits"))
      .as[(Long, Seq[Int])].collect().toMap
    val viaAgg = Dedup.simhashTable(spark, dir)
      .select("doc_id", "bits").as[(Long, Seq[Int])].collect().toMap
    assert(viaLambda.keySet == viaAgg.keySet)
    viaLambda.foreach { case (id, bits) =>
      assert(bits == viaAgg(id), s"doc $id fingerprints diverge")
    }
  }

  test("embeddingPairs: 20 pairs, cos descending, blocked by label, ids ordered") {
    val rows = Dedup.embeddingPairs(spark, sf("sf0.001"))
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
    assert(rows.length == 20)
    assert(rows.forall { case (a, b, _) => a < b })
    val cs = rows.map(_._3)
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
  }

  test("embeddingPairs hot label is capped at MaxLabelBlock lowest vec_ids") {
    // 300 vectors share label 0 — uncapped, that one label is
    // C(300,2) = 44850 exact dot products and grows quadratically on
    // class-skewed corpora. Plant the corpus's strongest pair ACROSS
    // the cap boundary (290 ≈ copy of 5): the cap must exclude it,
    // keep only the 256 lowest vec_ids, and still surface the planted
    // within-cap pair (7, 100) as the top result.
    val rnd = new scala.util.Random(77)
    def randVec() = Seq.fill(64)((rnd.nextGaussian() * 0.5).toFloat)
    val base = (0 until 300).filterNot(i => i == 100 || i == 290)
      .map(i => (i.toLong, randVec(), 0))
    def copyOf(src: Long, id: Long) = {
      val v = base.find(_._1 == src).get._2
      (id, v.map(x => x + 0.0005f * rnd.nextGaussian().toFloat), 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-cap").toString
    (base :+ copyOf(7L, 100L) :+ copyOf(5L, 290L))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Dedup.embeddingPairs(spark, dir)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
    val cap = Dedup.MaxLabelBlock
    assert(rows.flatMap(r => Seq(r._1, r._2)).forall(_ < cap),
      "capped block must only pair the lowest vec_ids")
    assert(!rows.exists(r => (r._1, r._2) == (5L, 290L)),
      "pair across the cap boundary must be excluded")
    assert((rows.head._1, rows.head._2) == (7L, 100L) && rows.head._3 >= 0.99,
      s"within-cap planted copy must rank first, got ${rows.head}")
  }

  test("hot MinHash band bucket degrades to star pairs, bounded and connected") {
    // 80 byte-identical docs (one boilerplate flood) hash every band
    // identically: one bucket captures 2/3 of the corpus. Uncapped,
    // that is C(80,2) = 3160 candidate pairs from a single bucket —
    // the quadratic blow-up MaxBandDf bounds. The star degradation
    // must emit exactly the 79 (min, member) pairs for the clique,
    // keep them connected through the minimum, and leave small-bucket
    // recall untouched (a planted near-dup pair outside the flood).
    val base = (1 to 30).map(i => s"t$i").mkString(" ")
    val flood = (100 until 180).map(i => (i.toLong, base))
    val pairA = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa2"))
    val noise = (10 until 40).map(i =>
      (i.toLong, s"n$i x$i y$i z$i w$i v$i u$i s$i r$i q$i p$i o$i"))
    val dir = docsDir(flood ++ pairA ++ noise)
    val cands = Dedup.minhashCandidates(Dedup.minhashSignatures(spark, dir), bandRows = 2)
      .as[(Long, Long)].collect().toSet
    val cliqueCands = cands.filter(p => p._1 >= 100L && p._2 >= 100L)
    assert(cliqueCands == (101L until 180L).map(i => (100L, i)).toSet,
      s"hot bucket must star to the minimum member: got ${cliqueCands.size} pairs")
    assert(cands.contains((1L, 2L)),
      "small-bucket near-dup recall must survive the cap")
    // the scored surface still ranks the flood's star pairs first
    val top = Dedup.minhashLsh(spark, dir)
      .select("id_a", "id_b", "est_jaccard").as[(Long, Long, Double)].collect()
    assert(top.take(5).forall(r => r._1 == 100L && r._3 == 1.0),
      "star pairs of identical docs must rank at est_jaccard 1.0")
    Dedup.releaseIndexes(spark)
  }

  test("hot SimHash chunk bucket degrades to star pairs, bounded and connected") {
    // 80 byte-identical docs share the identical 64-bit fingerprint, so
    // ONE 16-bit chunk bucket (×4) captures the whole flood; uncapped
    // that is C(80,2) candidate pairs per chunk. With the MaxBandDf
    // star degradation (round 11 — the last inverted index to get it)
    // the clique contributes exactly the 79 (min, member) pairs, all at
    // Hamming 0, and a planted near-identical pair outside the flood is
    // still recovered through its small chunk buckets.
    val base = (1 to 30).map(i => s"t$i").mkString(" ")
    val flood = (100 until 180).map(i => (i.toLong, base))
    // near-identical pair OUTSIDE the flood: 60 shared tokens, one
    // differing — few fingerprint bits flip, so the pigeonhole
    // guarantees a shared 16-bit chunk (Hamming well under 4×1)
    val longBase = (1 to 60).map(i => s"w$i").mkString(" ")
    val pairA = Seq(
      (1L, s"$longBase tailone"),
      (2L, s"$longBase tailtwo"))
    val noise = (10 until 40).map(i =>
      (i.toLong, s"n$i x$i y$i z$i w$i v$i u$i s$i r$i q$i p$i o$i"))
    val dir = docsDir(flood ++ pairA ++ noise)
    val top = Dedup.simhashPairs(spark, dir)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val clique = top.filter(r => r._1 >= 100L && r._2 >= 100L)
    assert(clique.nonEmpty && clique.forall(r => r._1 == 100L && r._3 == 0),
      s"flood pairs must be stars to the minimum at Hamming 0: ${clique.take(3).mkString(",")}")
    // the full candidate surface is bounded: count via the capped join
    // shape itself — the flood contributes exactly 79 distinct pairs
    import org.apache.spark.sql.functions.{array, col, posexplode, substring}
    val docs = Dedup.simhashDocs(spark, dir)
    val chunks = docs.select(col("doc_id"),
      posexplode(array((0 until 4).map(j =>
        substring(col("bitstr"), j * 16 + 1, 16)): _*))
        .as(Seq("chunk_idx", "chunk")))
    val cands = Dedup.starCappedPairs(
      chunks.select(col("doc_id").as("id"), col("chunk_idx"), col("chunk")),
      Seq("chunk_idx", "chunk")).as[(Long, Long)].collect().toSet
    val cliqueCands = cands.filter(p => p._1 >= 100L && p._2 >= 100L)
    assert(cliqueCands == (101L until 180L).map(i => (100L, i)).toSet,
      s"hot chunk must star to the minimum member: got ${cliqueCands.size} pairs")
    // the planted small-bucket pair survives the cap (they share at
    // least one 16-bit chunk — near-identical token multisets)
    assert(cands.contains((1L, 2L)),
      "small-bucket near-dup recall must survive the cap")
    Dedup.releaseIndexes(spark)
  }

  test("hot embedding LSH bucket degrades to star pairs, bounded and connected") {
    // 80 byte-identical embeddings collapse into ONE bucket in every
    // table; uncapped that is C(80,2) pairs × 8 tables of join work.
    // With MaxBandDf the clique contributes exactly 79 star pairs (all
    // at cos 1 — copies of the bucket minimum), and a planted near-dup
    // pair in a small bucket is still recovered.
    val rnd = new scala.util.Random(99)
    def randVec() = Seq.fill(64)((rnd.nextGaussian() * 0.5).toFloat)
    val hot = randVec()
    val flood = (100 until 180).map(i => (i.toLong, hot, 0))
    val src = randVec()
    val planted = Seq(
      (1L, src, 1),
      (2L, src.map(x => x + 0.0005f * rnd.nextGaussian().toFloat), 2))
    val noise = (10 until 40).map(i => (i.toLong, randVec(), i % 5))
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-skew").toString
    (flood ++ planted ++ noise).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // Some(-1.0) = every collided pair, uncapped — the full candidate
    // surface after the star degradation
    val all = Dedup.embeddingPairsAnn(spark, dir, minCos = Some(-1.0))
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
    val clique = all.filter(r => r._1 >= 100L && r._2 >= 100L)
    assert(clique.map(r => (r._1, r._2)).toSet ==
      (101L until 180L).map(i => (100L, i)).toSet,
      s"hot bucket must star to the minimum member: got ${clique.length} pairs")
    assert(clique.forall(_._3 > 0.999), "identical vectors score cos 1")
    assert(all.exists(r => (r._1, r._2) == (1L, 2L) && r._3 >= 0.99),
      "small-bucket planted near-dup must survive the cap")
    Dedup.releaseIndexes(spark)
  }

  test("embeddingPairsAnn with an explicit threshold is uncapped; audit default stays top-20") {
    // 25 planted near-copies → 25 true pairs above 0.95. The audit
    // default (no threshold) must report exactly 20; a threshold-driven
    // dedup call must return ALL of them — a silent top-20 cap there
    // would drop real duplicates (round-5 advice).
    val rnd = new scala.util.Random(55)
    def randVec() = Seq.fill(64)((rnd.nextGaussian() * 0.5).toFloat)
    val base = (0 until 25).map(i => (i.toLong, randVec(), i % 10))
    val copies = base.map { case (id, v, lbl) =>
      (id + 100L, v.map(x => x + 0.0005f * rnd.nextGaussian().toFloat), lbl)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-uncap").toString
    (base ++ copies).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val thresholded = Dedup.embeddingPairsAnn(spark, dir, minCos = Some(0.95))
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
    val planted = (0 until 25).map(i => (i.toLong, i + 100L)).toSet
    assert(planted.subsetOf(thresholded.map(r => (r._1, r._2)).toSet),
      s"threshold run must return every planted pair, got ${thresholded.length} rows")
    assert(thresholded.forall(_._3 >= 0.95))
    val audit = Dedup.embeddingPairsAnn(spark, dir).collect()
    assert(audit.length == 20, s"audit default must stay top-20, got ${audit.length}")
    Dedup.releaseIndexes(spark)
  }

  test("embeddingPairsAnn finds cross-label near-copies the label block cannot see") {
    // 40 seeded vectors, labels i % 10; ids 1/3/7 get a near-copy at
    // 21/23/27 with a DIFFERENT label — a mislabeled re-ingest. The
    // label-blocked operator is structurally blind to these pairs; the
    // bucket-blocked one must surface all three.
    val rnd = new scala.util.Random(321)
    def randVec() = Seq.fill(64)((rnd.nextGaussian() * 0.5).toFloat)
    val base = (0 until 40).filterNot(i => Seq(21, 23, 27).contains(i))
      .map(i => (i.toLong, randVec(), i % 10))
    val planted = Seq(1, 3, 7).map { i =>
      val src = base.find(_._1 == i.toLong).get._2
      ((20 + i).toLong, src.map(x => x + 0.001f * rnd.nextGaussian().toFloat),
        (i + 5) % 10) // different label than the source
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-ann").toString
    (base ++ planted).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ann = Dedup.embeddingPairsAnn(spark, dir)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
    Seq((1L, 21L), (3L, 23L), (7L, 27L)).foreach { p =>
      val hit = ann.find(r => (r._1, r._2) == p)
      assert(hit.nonEmpty, s"bucket-blocked near-dup must find cross-label pair $p")
      assert(hit.get._3 >= 0.99, s"planted copy $p should score ~1, got ${hit.get._3}")
    }
    val blocked = Dedup.embeddingPairs(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    Seq((1L, 21L), (3L, 23L), (7L, 27L)).foreach { p =>
      assert(!blocked.contains(p), s"label block unexpectedly contains $p")
    }
    Dedup.releaseIndexes(spark)
  }

  test("semanticDedup drops planted near-copies against their lowest cell-mate, keeps strangers") {
    // 30 seeded vectors plus near-copies of id 2 at ids 40 and 41
    // (cos ≈ 1 ⇒ same argmax cell as their source). Both copies must
    // be dropped against dup_of = 2 (keep-lowest-id); id 2 itself and
    // unrelated vectors must survive (random 64-dim gaussians sit far
    // below the threshold of any planted pair).
    val rnd = new scala.util.Random(97)
    def randVec() = Seq.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 30).map(i => (i.toLong, randVec(), i % 5))
    val src = base(2)._2
    val planted = Seq(40L, 41L).map { id =>
      (id, src.map(x => x + 0.0005f * rnd.nextGaussian().toFloat), 9)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    (base ++ planted).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val actions = Dedup.semanticDedup(spark, dir, minCos = 0.9)
      .select("vec_id", "dup_of", "max_cos").as[(Long, Long, Double)].collect()
    val byId = actions.map(a => a._1 -> a).toMap
    Seq(40L, 41L).foreach { id =>
      assert(byId.contains(id), s"planted copy $id must be dropped: ${actions.toSeq}")
      assert(byId(id)._2 == 2L, s"copy $id must dedup against its source, got ${byId(id)}")
      assert(byId(id)._3 >= 0.99, s"copy $id should score ~1, got ${byId(id)._3}")
    }
    assert(!byId.contains(2L), "the kept representative must not be dropped")
    assert(actions.length == 2, s"strangers must survive: ${actions.toSeq}")
    Dedup.releaseIndexes(spark)
  }

  test("curateD4 composes SemDeDup then prototype pruning over the survivors") {
    val dir = sf("sf0.001")
    val actions = Dedup.curateD4(spark, dir)
      .select("vec_id", "cell", "action").as[(Long, Int, String)].collect()
    val all = SimilarityIvf.prototypeScores(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    // totality: one action per scored vector, no extras
    assert(actions.map(_._1).toSet == all && actions.length == all.size,
      "the audit table must cover every vector exactly once")
    // stage 1 drops are exactly semanticDedup's
    val semExpect = Dedup.semanticDedup(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val sem = actions.filter(_._3 == "drop_semdedup").map(_._1).toSet
    assert(sem == semExpect, "semantic drops must match the SemDeDup operator")
    // stage 2 quotas are computed over SURVIVORS, not the full cell
    val survivors = actions.filter(_._3 != "drop_semdedup")
    survivors.groupBy(_._2).foreach { case (cell, rows) =>
      val quota = math.floor(SimilarityIvf.PrototypeFrac * rows.length).toLong
      val got = rows.count(_._3 == "drop_prototype")
      assert(got == quota, s"cell $cell: $got prototype drops, expected $quota")
    }
    Dedup.releaseIndexes(spark)
  }
  test("source overlap: planted cross-source mirror dominates, within-source pair excluded by orientation") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // srcA doc 1 ~ srcB doc 2 (near-identical, cross-source);
    // srcA docs 3 ~ 4 (near-identical, SAME source);
    // doc 5 unrelated.
    val dir = java.nio.file.Files.createTempDirectory("graft-srcov").toString
    val base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    Seq(
      (1L, s"$base endA", "srcA"), (2L, s"$base endB", "srcB"),
      (3L, s"q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 end1", "srcA"),
      (4L, s"q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 end2", "srcA"),
      (5L, "lone text with no relatives at all here", "srcB"))
      .map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out.contains(("srcA", "srcB")), s"cross-source pair missing: $out")
    assert(out(("srcA", "srcB"))._1 == 1L)
    assert(out(("srcA", "srcB"))._2 > 0.5)
    assert(out.contains(("srcA", "srcA")) && out(("srcA", "srcA"))._1 == 1L,
      "within-source near-dup pair must report under (srcA, srcA)")
    assert(!out.contains(("srcB", "srcB")), "no high-jaccard pair within srcB")
    Dedup.releaseIndexes(spark)
  }
}
