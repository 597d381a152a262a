package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Composed index-lifecycle walk: the pairwise op≡rebuild pins
  * (IndexPersistenceSpec's append, EraseSpec's erase, the compaction
  * fold) say each verb alone commutes with a from-scratch build —
  * this spec pins that a SEQUENCE of interleaved verbs does too:
  * write → append → erase → append → compact → erase on one living
  * corpus must leave every non-frozen artifact row-identical to one
  * writeIndexes over the corpus's final net state. A divergence here
  * with the pairwise pins green would mean an op leaks state ACROSS
  * ops (batch history resurrecting erased rows, compaction folding a
  * stale generation, an erase missing a batch directory an append
  * created) — exactly the class of bug the crash-path reviews kept
  * finding one verb at a time. */
class LifecycleWalkSpec extends SparkSpec {
  import spark.implicits._

  // deterministic per-id content so the living corpus's net state is
  // reproducible in the reference copy regardless of op order
  private def docText(id: Long): String =
    if (id % 2 == 0) s"w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 end$id" // near-dup family
    else s"n${id}a n${id}b n${id}c n${id}d n${id}e n${id}f n${id}g n${id}h n${id}i n${id}j n${id}k n${id}l"
  private def docRows(ids: Seq[Long]) =
    ids.map(id => (id, docText(id), "en", "srcT", docText(id).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  private def vecRows(ids: Seq[Long]) =
    ids.map { id =>
      val rnd = new scala.util.Random(id)
      (id, Seq.fill(64)(rnd.nextGaussian().toFloat), (id % 5).toInt)
    }.toDF("vec_id", "embedding", "label")

  private def rows(path: String): Set[Seq[Any]] = {
    val f = new java.io.File(path)
    if (!f.exists()) Set.empty
    else spark.read.parquet(path).drop("batch_id").collect()
      .map(_.toSeq.map {
        case a: scala.collection.Seq[_] => a.toList
        case x => x
      }).toSet
  }

  private def freshSession(): Unit = {
    Dedup.releaseIndexes(spark)
    SimilarityIvf.clearFitCache()
  }

  test("interleaved append/erase/compact walk equals one rebuild on the net corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-walk").toString
    var liveDocs = (1L to 4L).toSet
    var liveVecs = (0L until 24L).toSet
    docRows(liveDocs.toSeq.sorted).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    vecRows(liveVecs.toSeq.sorted).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-walk-idx").toString
    Dedup.writeIndexes(spark, dir, idx)

    var nextDoc = 5L; var nextVec = 24L
    def appendBatch(tag: String): Unit = {
      val newDocs = Seq(nextDoc, nextDoc + 1); nextDoc += 2
      val newVecs = (nextVec until nextVec + 6); nextVec += 6
      docRows(newDocs).write.mode("append").parquet(s"$dir/documents.parquet")
      vecRows(newVecs).write.mode("append").parquet(s"$dir/embeddings.parquet")
      liveDocs ++= newDocs; liveVecs ++= newVecs
      Dedup.appendIndexes(spark, dir, idx,
        docPredicate = col("doc_id").isin(newDocs: _*),
        embPredicate = Some(col("vec_id").isin(newVecs: _*)),
        batchId = Some(tag))
    }
    def eraseSome(docs: Seq[Long], vecs: Seq[Long]): Unit = {
      liveDocs --= docs; liveVecs --= vecs
      Dedup.eraseDocuments(spark, dir, idx, docs, vecs)
    }

    appendBatch("b1")                 // live docs 1-6
    eraseSome(Seq(2L, 5L), Seq(3L, 17L))
    appendBatch("b2")                 // live docs 1,3,4,6,7,8
    Dedup.compactIndexes(spark, idx)
    eraseSome(Seq(7L), Seq(25L, 11L))

    // reference: one writeIndexes over a COPY of the corpus's net state
    val dirB = java.nio.file.Files.createTempDirectory("graft-walk-ref").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    spark.read.parquet(s"$dir/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$dirB/embeddings.parquet")
    val idxB = java.nio.file.Files.createTempDirectory("graft-walk-idxB").toString
    freshSession()
    Dedup.writeIndexes(spark, dirB, idxB)

    // the corpus's net state is exactly the walked live sets
    val docsLeft = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").as[Long].collect().toSet
    assert(docsLeft === liveDocs, s"corpus docs diverged from the walk: $docsLeft")
    val vecsLeft = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").as[Long].collect().toSet
    assert(vecsLeft === liveVecs, s"corpus vecs diverged from the walk: $vecsLeft")

    // every non-frozen artifact: walked index ≡ net-state rebuild
    // (frozen train-once models and the row tables encoded under them
    // are excluded for the same reason as the pairwise pins: the walk
    // keeps the original models by design, the rebuild refits)
    Seq("docShingles", "shingleIndex", "jaccardPairs", "minhashSigs",
      "minhashBands", "simhashTable", "embBase", "lshBuckets", "ivfCells",
      "sq8Codes", "curationToks", "labelCentroids",
      "clusterLabels", "wordGraph", "nbQualityModel").foreach { a =>
      assert(rows(s"$idx/$a.parquet") === rows(s"$idxB/$a.parquet"),
        s"walk-vs-rebuild divergence in $a")
    }

    // and the walked index SERVES the net state: primed queries see
    // no erased id and every appended survivor
    freshSession()
    Dedup.primeIndexes(spark, dir, idx)
    val pairIds = Dedup.jaccardPairTable(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(pairIds.subsetOf(liveDocs), s"pair table serves dead ids: ${pairIds -- liveDocs}")
    assert(pairIds.contains(6L) && pairIds.contains(8L),
      s"appended near-dup docs missing from the served pair table: $pairIds")
    val neighbors = Similarity.knnExact(spark, dir, nQueries = 5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!neighbors.contains(17L) && !neighbors.contains(25L) && !neighbors.contains(11L),
      s"erased vectors still served: $neighbors")
  }
}
