package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-sized LSH plane count (the round-13 scale fix: the fixed
  * 8-plane geometry made serving candidate volume grow ∝ N/256 —
  * 110–124 s vs IVF's 12.7–16 s at the 100× tier). Pins: the sizing
  * thresholds, the legacy-prefix property of the extended plane pool,
  * artifact-wins geometry resolution, and end-to-end serving
  * correctness on a corpus big enough to trigger h > 8. */
class LshGeometrySpec extends SparkSpec {
  import spark.implicits._

  test("hForCount: floor at 8 through 8192 vectors, grows logarithmically, ceils at 24") {
    assert(Similarity.hForCount(0) == 8)
    assert(Similarity.hForCount(500) == 8)    // sf0.001/0.01
    assert(Similarity.hForCount(2000) == 8)   // sf0.1 — test oracles unchanged
    assert(Similarity.hForCount(8192) == 8)   // last count on the floor
    assert(Similarity.hForCount(8193) == 9)
    assert(Similarity.hForCount(40000) == 11)  // 20x probe tier
    assert(Similarity.hForCount(200000) == 13) // 100x probe tier
    assert(Similarity.hForCount(Long.MaxValue / 4) == 24) // ceiling
    // exact power-of-two boundaries are value-stable (integer bit
    // length, no floating-point log wobble): 32·2^19 is the last count
    // at h=19; one more vector crosses to 20
    assert(Similarity.hForCount(32L * (1L << 19)) == 19)
    assert(Similarity.hForCount(32L * (1L << 19) + 1) == 20)
  }

  test("fresh-session append buckets the batch under the ON-DISK artifact's plane count") {
    // build at N=500 (h=8), grow the corpus past the h=9 sizing
    // boundary, then append from a session with NO primed memo: the
    // batch must inherit the artifact's 8-plane geometry (read off the
    // parquet bucket strings), not the count formula's h=9 over the
    // grown corpus — mixed-length bucket strings would silently never
    // collide with the persisted rows
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-append").toString
    val indexDir = java.nio.file.Files.createTempDirectory("graft-lsh-append-idx").toString
    val rnd = new scala.util.Random(11)
    def vecs(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, Seq.fill(Similarity.Dim)(rnd.nextGaussian().toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
    Seq((1L, "base doc one", "en", "srcT", 12L), (2L, "base doc two", "en", "srcT", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    vecs(0, 500).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Dedup.writeIndexes(spark, dir, indexDir)
    // corpus grows 20x past the build: 10000 vectors => hForCount = 9
    val grown = vecs(500, 10000)
    spark.read.parquet(s"$dir/embeddings.parquet").unionByName(grown)
      .write.mode("overwrite").parquet(s"$dir/embeddings_grown.parquet")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/embeddings_grown.parquet"),
      new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"))
    // simulate a FRESH maintenance session: no memo, no cached h
    Dedup.releaseIndexes(spark)
    Similarity.invalidateCorpusH(spark, dir)
    assert(Dedup.memoGet(spark, s"lshBuckets|$dir").isEmpty, "memo not cleared")
    Dedup.appendIndexes(spark, dir, indexDir,
      docPredicate = col("doc_id") < 0L, // doc side: empty batch
      embPredicate = Some(col("vec_id") >= 500L),
      rebuildPairs = false, batchId = Some("grown"))
    // every persisted bucket string — base AND appended batch — is 8
    // chars: one geometry, old and new rows collide as built
    val lens = spark.read.parquet(s"$indexDir/lshBuckets.parquet")
      .select(length(col("bucket")).as("len")).distinct()
      .as[Int].collect().toSet
    assert(lens == Set(8), s"mixed plane counts in the appended artifact: $lens")
    Dedup.releaseIndexes(spark)
    Similarity.invalidateCorpusH(spark, dir)
  }

  test("extended plane pool preserves the legacy 8-plane prefix bit-for-bit") {
    // bucket strings at h=12 must START with the h=8 string for every
    // vector and table: planes 1..8 come from the legacy seeded pool,
    // extras from a separate seed — the property that keeps persisted
    // test-scale artifacts and the baked SQL oracle literals valid
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 20)
      .map(i => (i.toLong, Seq.fill(Similarity.Dim)(rnd.nextGaussian())))
      .toDF("vec_id", "v")
    val both = vecs.select(col("vec_id"),
        posexplode(Similarity.bucketStrings(col("v"), 8)).as(Seq("t", "b8")))
      .join(vecs.select(col("vec_id"),
        posexplode(Similarity.bucketStrings(col("v"), 12)).as(Seq("t", "b12"))),
        Seq("vec_id", "t"))
      .select(col("b8"), col("b12")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (b8, b12) = (r.getString(0), r.getString(1))
      assert(b8.length == 8 && b12.length == 12 && b12.startsWith(b8),
        s"prefix property violated: $b8 vs $b12")
    }
  }

  test("fused bucket kernel is byte-identical to the composed sign-dot formulation") {
    // the r15 fused LshBucketStrings expression must reproduce the
    // T×H-dot chain bit-for-bit — persisted artifacts, stream probes
    // and the baked SQL oracle literals all depend on these exact
    // strings — including the degenerate inputs the old chain mapped
    // to all-zero buckets (null vector / wrong length / null element)
    val rnd = new scala.util.Random(23)
    def check(df: org.apache.spark.sql.DataFrame, h: Int, tag: String): Unit = {
      val rows = df.select(col("vec_id"),
          Similarity.bucketStrings(col("v"), h).as("fused"),
          Similarity.bucketStringsComposed(col("v"), h).as("composed"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"$tag vec ${r.getLong(0)}: ${r.getSeq[String](1)} != ${r.getSeq[String](2)}")
      }
    }
    // double elements at the legacy and an extended plane count
    val dbl = (0 until 50)
      .map(i => (i.toLong, Seq.fill(Similarity.Dim)(rnd.nextGaussian())))
      .toDF("vec_id", "v")
    check(dbl, 8, "double/h8")
    check(dbl, 13, "double/h13")
    // float elements (the production embeddings column type)
    val flt = (0 until 50)
      .map(i => (i.toLong, Seq.fill(Similarity.Dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "v")
    check(flt, 8, "float/h8")
    check(flt, 11, "float/h11")
    // degenerate inputs: null vector, wrong length, null element
    val weird = Seq(
      (1L, null.asInstanceOf[Seq[java.lang.Double]]),
      (2L, Seq.fill(10)(java.lang.Double.valueOf(rnd.nextGaussian()))),
      (3L, Seq.tabulate(Similarity.Dim)(i =>
        if (i == 7) null else java.lang.Double.valueOf(rnd.nextGaussian()))))
      .toDF("vec_id", "v")
    check(weird, 8, "degenerate")
    weird.select(Similarity.bucketStrings(col("v"), 8).as("f")).collect()
      .foreach(r => assert(r.getSeq[String](0).forall(_ == "00000000"),
        "degenerate inputs must map to all-zero buckets"))
    // non-finite vectors: Spark's double comparison puts NaN ABOVE
    // every value (NaN >= 0 is true), so a NaN-accumulating dot must
    // emit bit '1' in BOTH formulations — a raw Java `acc >= 0` in the
    // fused kernel would emit '0' and such rows would never collide
    // across the fused/composed boundary (embBase's nrm > 0 filter
    // does not exclude them: NaN > 0 is true in Spark)
    val nonFinite = Seq(
      (10L, Seq.tabulate(Similarity.Dim)(i =>
        if (i == 3) Double.NaN else rnd.nextGaussian())),           // NaN component
      (11L, Seq.tabulate(Similarity.Dim)(i =>
        if (i == 0) Double.PositiveInfinity else rnd.nextGaussian())), // +Inf dot
      (12L, Seq.tabulate(Similarity.Dim)(i =>
        if (i == 0) Double.PositiveInfinity
        else if (i == 1) Double.NegativeInfinity
        else rnd.nextGaussian())),                                  // Inf − Inf → NaN
      (13L, Seq.tabulate(Similarity.Dim)(i =>
        if (i == 5) Double.NegativeInfinity else rnd.nextGaussian()))) // −Inf dot
      .toDF("vec_id", "v")
    check(nonFinite, 8, "non-finite")
    check(nonFinite, 13, "non-finite/h13")
    // and the NaN row specifically buckets as all-ones (every plane's
    // dot is NaN, every bit '1') — the pinned Spark-semantics value
    val nanBits = nonFinite.filter(col("vec_id") === 10L)
      .select(Similarity.bucketStrings(col("v"), 8).as("f")).collect()
    nanBits.foreach(r => assert(r.getSeq[String](0).forall(_ == "11111111"),
      s"NaN-dot vector must bucket all-ones: ${r.getSeq[String](0)}"))
  }

  test("corpusH: an existing bucket artifact's geometry wins over the count formula") {
    val dir = "/graft-test/fake-lsh-dir"
    // fake a primed artifact whose buckets are 11 chars long — corpusH
    // must serve 11 (the frozen build-time geometry), NOT recompute
    // from any corpus count
    Dedup.memoPut(spark, s"lshBuckets|$dir",
      Seq((0L, 0, "10110010101")).toDF("vec_id", "table_idx", "bucket"))
    Similarity.invalidateCorpusH(spark, dir)
    assert(Similarity.corpusH(spark, dir) == 11)
    Similarity.invalidateCorpusH(spark, dir)
  }

  test("large corpus builds h=9 buckets and the serving head stays correct") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-h9").toString
    val rnd = new scala.util.Random(5)
    // 10k vectors at the production Dim=64 (the hyperplanes are
    // 64-dim; a shorter fixture would degenerate every bucket to the
    // NULL-dot "00000000") -> hForCount = ceil(log2(10000/32)) = 9
    (0 until 10000)
      .map(i => (i.toLong, Seq.fill(Similarity.Dim)(rnd.nextGaussian().toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.corpusH(spark, dir) == 9)
    val buckets = Similarity.lshBuckets(spark, dir)
    assert(buckets.select(max(length(col("bucket")))).collect()(0).getInt(0) == 9)
    // occupancy sanity: mean bucket population stays near the target
    // (10000 / 2^9 ~ 20), nowhere near the corpus
    val meanOcc = buckets.groupBy("table_idx", "bucket").count()
      .agg(avg("count")).collect()(0).getDouble(0)
    assert(meanOcc < 4 * Similarity.TargetBucketOccupancy,
      s"mean occupancy $meanOcc — plane count not controlling it")
    // serving: a corpus-identical query self-matches at cos 1 under
    // the 9-plane geometry (query-side hashing rides the same pool)
    val qv = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter("vec_id = 77").select("embedding").as[Seq[Float]].collect()(0)
    val served = Similarity.annServeBatch(spark, dir,
        Seq((9001L, qv)).toDF("query_id", "embedding"), k = 3, radius = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(served.exists(t => t._1 == 9001L && t._2 == 77L && t._3 == 1.0 && t._4 == 1),
      s"self-match missing under h=9: ${served.toSeq}")
    Dedup.releaseIndexes(spark)
    Similarity.invalidateCorpusH(spark, dir)
  }
}
