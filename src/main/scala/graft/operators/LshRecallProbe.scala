package graft.operators
import org.apache.spark.sql.SparkSession
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val ex = Similarity.knnExact(spark, dir).select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def rec(df: org.apache.spark.sql.DataFrame): Double = {
        val ap = df.select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        ex.intersect(ap).size.toDouble / ex.size
      }
      println(s"== $dir")
      println(f"  lsh        ${rec(Similarity.annLsh(spark, dir))}%.3f")
      println(f"  lsh_multi  ${rec(Similarity.annLshMultiProbe(spark, dir))}%.3f")
      println(f"  ivf_fit    ${rec(SimilarityIvf.annIvfFitted(spark, dir))}%.3f")
      println(f"  ivf_tuned  ${rec(SimilarityIvf.annIvfTuned(spark, dir))}%.3f")
      println(f"  lsh_tuned  ${rec(Similarity.annLshTuned(spark, dir))}%.3f (radius=${Similarity.tunedLshRadius(spark, dir)})")
      Similarity.annRecallByFamily(spark, dir).collect().foreach(r => println(s"  report: $r"))
    }
    spark.stop()
  }
}
