package graft.operators

import graft.SparkSpec

/** Pins the parquet index persistence round-trip: writeIndexes
  * materializes every session index artifact, primeIndexes serves
  * later queries from the parquet files (not a rebuild), and the
  * served results are identical to the built ones.
  */
class IndexPersistenceSpec extends SparkSpec {
  import spark.implicits._

  /** Fixture corpus with both a documents and an embeddings table so
    * all seven index artifacts are exercised. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-idx-docs").toString
    val base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    Seq(
      (1L, s"$base end1"), (2L, s"$base end2"),
      (3L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11"),
      (4L, "lone text with no relatives at all here"))
      .map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rnd = new scala.util.Random(7)
    (0 until 30).map(i => (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat), i % 5))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private val artifacts = Seq("docShingles", "shingleIndex", "jaccardPairs",
    "minhashSigs", "simhashTable", "embBase", "lshBuckets")

  test("writeIndexes → releaseIndexes → primeIndexes serves identical results from parquet") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft-idx").toString
    Dedup.writeIndexes(spark, dir, indexDir)
    artifacts.foreach { a =>
      assert(new java.io.File(s"$indexDir/$a.parquet").exists(), s"missing artifact $a")
    }

    val builtPairs = Dedup.jaccardPairs(spark, dir)
      .select("id_a", "id_b", "n_common").as[(Long, Long, Long)].collect().toSet
    val builtLsh = Dedup.minhashLsh(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(builtPairs.nonEmpty)

    Dedup.releaseIndexes(spark)
    Dedup.primeIndexes(spark, dir, indexDir)

    // The primed pair table must be the parquet artifact, not a rebuild.
    val primed = Dedup.jaccardPairTable(spark, dir)
    assert(primed.inputFiles.nonEmpty && primed.inputFiles.forall(_.contains(indexDir)),
      s"primed table not served from $indexDir: ${primed.inputFiles.take(3).mkString(",")}")

    val primedPairs = Dedup.jaccardPairs(spark, dir)
      .select("id_a", "id_b", "n_common").as[(Long, Long, Long)].collect().toSet
    val primedLsh = Dedup.minhashLsh(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(primedPairs == builtPairs)
    assert(primedLsh == builtLsh)
    Dedup.releaseIndexes(spark)
  }

  test("primeIndexes with missing artifacts is a no-op and builders still run") {
    val emptyDir = java.nio.file.Files.createTempDirectory("graft-idx-empty").toString
    Dedup.primeIndexes(spark, dir, emptyDir)
    val pairs = Dedup.jaccardPairs(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    Dedup.releaseIndexes(spark)
  }

  test("writeIndexes withEmbeddings=false skips the embedding artifacts") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft-idx-noemb").toString
    Dedup.writeIndexes(spark, dir, indexDir, withEmbeddings = false)
    assert(new java.io.File(s"$indexDir/docShingles.parquet").exists())
    assert(!new java.io.File(s"$indexDir/embBase.parquet").exists())
    assert(!new java.io.File(s"$indexDir/lshBuckets.parquet").exists())
    Dedup.releaseIndexes(spark)
  }
}
