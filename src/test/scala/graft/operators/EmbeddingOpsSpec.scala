package graft.operators

import graft.SparkSpec

/** Pins the hard-negative mining semantics and the PSI drift report. */
class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val hard = EmbeddingOps.hardNegatives(spark, sf("sf0.001"))
    .select("query_id", "query_label", "neighbor_id", "neighbor_label", "cos", "rn")
    .as[(Long, Int, Long, Int, Double, Int)].collect()

  private lazy val labelOf: Map[Long, Int] =
    spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap

  test("hard negatives: k ranked rows per query, never the query's own label") {
    val byQuery = hard.groupBy(_._1)
    assert(byQuery.size == 10)
    byQuery.foreach { case (qid, rows) =>
      assert(rows.length == 5)
      val sorted = rows.sortBy(_._6)
      assert(sorted.map(_._6).toSeq == (1 to 5))
      val cs = sorted.map(_._5)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      rows.foreach { case (_, qlab, nid, nlab, _, _) =>
        assert(qlab == labelOf(qid), s"query $qid label drifted")
        assert(nlab == labelOf(nid), s"neighbor $nid label drifted")
        assert(nlab != qlab, s"query $qid mined a same-label 'negative' $nid")
      }
    }
  }

  test("hard negatives are the exact cross-label top-k (brute-force twin)") {
    // independent brute force off the raw parquet, double arithmetic
    val vecs = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Int)].collect()
      .map { case (id, v, l) => (id, v.map(_.toDouble).toArray, l) }
      .filter { case (_, v, _) => v.map(x => x * x).sum > 0 }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = vecs.filter(_._1 < 10).flatMap { case (qid, qv, qlab) =>
      vecs.filter(c => c._1 != qid && c._3 != qlab)
        .map { case (nid, nv, _) => (qid, nid, cos(qv, nv)) }
        .sortBy { case (_, nid, c) => (-c, nid) }
        .take(5).zipWithIndex
        .map { case ((_, nid, _), i) => (qid, nid, i + 1) }
    }.toSet
    assert(hard.map(r => (r._1, r._3, r._6)).toSet == expect)
  }

  test("ANN-blocked hard negatives: pre-filtered labels, recall >= 0.8 vs exact") {
    val ann = EmbeddingOps.hardNegativesAnn(spark, sf("sf0.001"))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(ann.nonEmpty)
    ann.foreach { case (qid, nid) =>
      assert(labelOf(nid) != labelOf(qid),
        s"ANN candidate stage leaked a same-label neighbor $nid for query $qid")
    }
    val exactSet = hard.map(r => (r._1, r._3)).toSet
    val hit = ann.count(exactSet.contains)
    val recall = hit.toDouble / exactSet.size
    assert(recall >= 0.8, s"hard-negative ANN recall $recall < 0.8")
  }

  test("training triplets: per-anchor hardest positive + hardest negative, brute-force twin") {
    val trip = EmbeddingOps.trainingTriplets(spark, sf("sf0.001"))
      .select("anchor_id", "anchor_label", "pos_id", "pos_cos", "neg_id", "neg_cos", "margin")
      .as[(Long, Int, java.lang.Long, java.lang.Double, java.lang.Long, java.lang.Double, java.lang.Double)]
      .collect()
    assert(trip.length == 10)
    // hard negatives already pin the cross-label top-k exactly; the
    // triplet's negative must be each query's rank-1 hard negative
    val topNeg = hard.filter(_._6 == 1).map(r => r._1 -> r._3).toMap
    trip.foreach { case (aid, alab, posId, posCos, negId, negCos, margin) =>
      assert(alab == labelOf(aid))
      assert(posId != null && negId != null, s"anchor $aid missing a branch")
      assert(labelOf(posId) == alab, s"anchor $aid positive crossed labels")
      assert(labelOf(negId) != alab, s"anchor $aid negative shares the label")
      assert(negId.longValue == topNeg(aid), s"anchor $aid negative != rank-1 hard negative")
      assert(math.abs(margin - (posCos - negCos)) == 0.0)
    }
  }

  test("ANN triplets: label constraints hold, >= 8/10 anchors match the exact triplet") {
    val exact = EmbeddingOps.trainingTriplets(spark, sf("sf0.001"))
      .select("anchor_id", "pos_id", "neg_id")
      .as[(Long, java.lang.Long, java.lang.Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ann = EmbeddingOps.trainingTripletsAnn(spark, sf("sf0.001"))
      .select("anchor_id", "anchor_label", "pos_id", "neg_id")
      .as[(Long, Int, java.lang.Long, java.lang.Long)].collect()
    assert(ann.length == 10)
    ann.foreach { case (aid, alab, posId, negId) =>
      assert(posId == null || labelOf(posId) == alab)
      assert(negId == null || labelOf(negId) != alab)
    }
    val agree = ann.count { case (aid, _, p, n) => exact(aid) == ((p, n)) }
    assert(agree >= 8, s"only $agree/10 ANN triplets match the exact twin")
  }

  // mirrored fixture: vec 2i and 2i+1 carry the IDENTICAL vector, so
  // ref/cur occupancies agree cell by cell and PSI is exactly zero
  private def writeFixture(shiftOdd: Boolean): String = {
    val rnd = new scala.util.Random(77)
    val rows = (0 until 40).flatMap { i =>
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val odd =
        if (shiftOdd) v.zipWithIndex.map { case (x, j) => if (j < 8) x + 5.0f else x }
        else v
      Seq((2L * i, v.toSeq, i % 4), (2L * i + 1, odd.toSeq, i % 4))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("drift: mirrored snapshots score PSI exactly 0; a planted shift scores large") {
    val same = EmbeddingOps.embeddingDrift(spark, writeFixture(shiftOdd = false))
      .select("psi_total").as[Double].collect()
    assert(same.nonEmpty && same.forall(_ == 0.0),
      s"identical snapshot halves must have zero PSI, got ${same.headOption}")
    val shifted = EmbeddingOps.embeddingDrift(spark, writeFixture(shiftOdd = true))
      .select("psi_total").as[Double].collect()
    assert(shifted.nonEmpty)
    assert(shifted.forall(_ == shifted.head), "psi_total must be constant per report")
    assert(shifted.head > 0.5, s"planted shift PSI ${shifted.head} unexpectedly small")
  }

  test("feature drift: digit-count buckets cover the corpus; a planted length shift trips") {
    val rows = EmbeddingOps.featureDrift(spark, sf("sf0.001"))
      .select("cell", "n_ref", "n_cur", "psi_total")
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val n = spark.read.parquet(sf("sf0.001") + "/documents.parquet").count()
    assert(rows.map(r => r._2 + r._3).sum == n)
    val basePsi = rows.head._4
    assert(basePsi >= 0.0 && rows.forall(_._4 == basePsi))
    // planted shift: odd docs an order of magnitude longer
    val dir = java.nio.file.Files.createTempDirectory("graft-fdrift").toString
    (0L until 200L).map { i =>
      val len = if (i % 2 == 1) 5000L else 500L
      (i, "x", "en", "s", len)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val shifted = EmbeddingOps.featureDrift(spark, dir)
      .select("psi_total").as[Double].collect()
    assert(shifted.head > 1.0,
      s"an order-of-magnitude length shift must trip hard, got ${shifted.head}")
  }

  test("drift report: per-cell counts cover the corpus, shares are smoothed finite") {
    val rows = EmbeddingOps.embeddingDrift(spark, sf("sf0.001"))
      .select("cell", "n_ref", "n_cur", "p_ref", "p_cur", "psi_contrib")
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val n = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet").count()
    assert(rows.map(r => r._2 + r._3).sum == n)
    rows.foreach { case (_, _, _, p, q, c) =>
      assert(p > 0 && q > 0 && !c.isNaN && !c.isInfinite)
    }
  }
}
