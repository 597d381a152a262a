package graft.operators

import org.apache.spark.sql.functions._

/** Dev probe: the round-12 operators at the 10× tier — TextRank over
  * 10× documents (token-shuffled variants, so vocabulary stays
  * Heaps-realistic while volume scales), MMR + the tuned probe ladder
  * over 10× embeddings (gaussian-perturbed replicas with offset ids),
  * and strong-tie components over the 10× transaction graph.
  *
  * sbt "runMain graft.operators.Round12ScaleProbe /root/testdata/sf0.1"
  */
object Round12ScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_10x").toString
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nDocs = docs.count(); val nEmb = emb.count()
    val rep = spark.range(10).select(col("id").as("r"))
    t("generate 10x documents (shuffled variants)") {
      // replica r of a doc rotates its token array by r — distinct
      // text, same vocabulary (the Heaps-realistic scale-up)
      docs.crossJoin(rep)
        .select((col("doc_id") + col("r") * nDocs).as("doc_id"),
          concat_ws(" ", flatten(array(
            slice(split(col("text"), " "), (col("r") % 7 + 1).cast("int"), lit(100000)),
            slice(split(col("text"), " "), lit(1), (col("r") % 7).cast("int")))))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    t("generate 10x embeddings (perturbed replicas)") {
      emb.crossJoin(rep)
        .select((col("vec_id") + col("r") * nEmb).as("vec_id"),
          transform(col("embedding"),
            x => x + (col("r").cast("float") * lit(0.001f))).as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    spark.read.parquet(s"$src/orders.parquet")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    spark.read.parquet(s"$src/lineitem.parquet")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    t("textrank 10x COLD (word graph build)") {
      TextAnalysis.textrankKeywords(spark, dir).count()
    }
    t("textrank 10x warm") {
      TextAnalysis.textrankKeywords(spark, dir).count()
    }
    t("mmr 10x COLD (embBase + pool build)") {
      Similarity.mmrRerank(spark, dir).count()
    }
    t("mmr 10x warm") {
      Similarity.mmrRerank(spark, dir).count()
    }
    t("tuned-probe ladder 10x (fit + ladder walk)") {
      SimilarityIvf.annIvfTuned(spark, dir).count()
    }
    println(s"[probe] tuned nprobe at 10x = ${SimilarityIvf.tunedProbe(spark, dir)}" +
      s" of ${SimilarityIvf.corpusK(spark, dir)} cells")
    t("tuned serving 10x warm") {
      SimilarityIvf.annIvfTuned(spark, dir).count()
    }
    t("strong components 10x COLD (edge artifact)") {
      Graph.strongComponents(spark, dir).count()
    }
    t("strong components 10x warm") {
      Graph.strongComponents(spark, dir).count()
    }
    spark.stop()
  }
}
