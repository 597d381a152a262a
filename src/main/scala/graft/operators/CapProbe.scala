package graft.operators

import org.apache.spark.sql.functions._

/** Dev probe: the round-17 derived star caps and the occupancy maxima
  * they respond to, at each gate SF — the check that a derived cap can
  * only change behavior where the static floor-mirroring oracles are
  * not looking (no bucket crosses the floor), or not at all (budget
  * keeps the floor).
  *
  * sbt "runMain graft.operators.CapProbe"
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      def maxOcc(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(max(col("df"))).first().getLong(0)
      val sh = Dedup.shingleIndex(spark, dir).groupBy("shingle")
        .agg(count(lit(1)).as("df"))
      val bands = Dedup.minhashBandTable(spark, dir)
        .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("df"))
      val chunks = Dedup.simhashDocs(spark, dir)
        .select(col("doc_id"), posexplode(array((0 until 4).map(j =>
          substring(col("bitstr"), j * 16 + 1, 16)): _*))
          .as(Seq("chunk_idx", "chunk")))
        .groupBy("chunk_idx", "chunk").agg(count(lit(1)).as("df"))
      val buckets = Similarity.lshBuckets(spark, dir)
        .groupBy("table_idx", "bucket").agg(count(lit(1)).as("df"))
      val labels = org.apache.spark.sql.SparkSession.active.read
        .parquet(s"$dir/embeddings.parquet")
        .groupBy("label").agg(count(lit(1)).as("df"))
      println(s"[cap] $sf shingle maxdf=${maxOcc(sh)} cap=${Dedup.shingleStarCap(spark, dir)}")
      println(s"[cap] $sf band    maxdf=${maxOcc(bands)} cap=${Dedup.bandStarCap(spark, dir)}")
      println(s"[cap] $sf chunk   maxdf=${maxOcc(chunks)} cap=${Dedup.chunkStarCap(spark, dir)}")
      println(s"[cap] $sf bucket  maxdf=${maxOcc(buckets)} cap=${Dedup.bucketStarCap(spark, dir)}")
      val labMax = maxOcc(labels)
      val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val labCap = Dedup.starCapFor(labels, nVecs, 256)
      println(s"[cap] $sf label   max=$labMax cap256=$labCap nVecs=$nVecs")
      Dedup.releaseIndexes(spark)
    }
    spark.stop()
  }
}
