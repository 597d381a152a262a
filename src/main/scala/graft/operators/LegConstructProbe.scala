package graft.operators

/** Dev probe (r19): per-leg DataFrame CONSTRUCTION time of the ANN
  * recall report — which of the 12 legs fires driver jobs at build
  * time, and whether they repeat once the session caches are warm.
  *
  * sbt "runMain graft.operators.LegConstructProbe /root/testdata/sf0.1"
  */
object LegConstructProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val legs: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "knn_exact" -> (() => Similarity.knnExact(spark, dir)),
      "ivf_fit" -> (() => SimilarityIvf.annIvfFitted(spark, dir)),
      "ivf_tuned" -> (() => SimilarityIvf.annIvfTuned(spark, dir)),
      "lsh" -> (() => Similarity.annLsh(spark, dir)),
      "lsh_probe" -> (() => Similarity.annLshMultiProbe(spark, dir)),
      "lsh_tuned" -> (() => Similarity.annLshTuned(spark, dir)),
      "pq" -> (() => SimilarityPq.knnPq(spark, dir)),
      "pq_rerank" -> (() => SimilarityPq.knnPqRerank(spark, dir)),
      "pq_rerank_tuned" -> (() => SimilarityPq.knnPqRerankTuned(spark, dir)),
      "ivfpq" -> (() => SimilarityPq.knnIvfPq(spark, dir)),
      "ivfpq_refined" -> (() => SimilarityPq.knnIvfPqRefined(spark, dir)),
      "sq8" -> (() => Similarity.knnSq8(spark, dir)),
      "ivf_sq8" -> (() => Similarity.knnIvfSq8(spark, dir)))
    (1 to 3).foreach { rep =>
      legs.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f()
        println(f"[leg] rep$rep $n%-18s construct ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
    }
    spark.stop()
  }
}
