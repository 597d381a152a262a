package graft.operators

import org.apache.spark.sql.functions._

/** Dev probe: file-per-bucket behavior of the bucketed edge write
  * under three plan shapes — the r18 single-pass writer produced
  * 9 tasks x 32 buckets = 288 files from the raw plan where the r17
  * file-fed writer produced 32.
  *
  * sbt "runMain graft.operators.EdgeWriteProbe /root/testdata/sf0.1"
  */
object EdgeWriteProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = spark.sessionState.conf.numShufflePartitions
    val out = java.nio.file.Files.createTempDirectory("graft_ewp").toString
    def files(p: String): (Int, Int) = {
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val names = fs.listStatus(new org.apache.hadoop.fs.Path(p))
        .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      val tasks = names.map(_.split("-")(1)).distinct.length
      (names.length, tasks)
    }
    def writeB(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS ewp_$name")
      df.repartition(n, col("src"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(n, "src").sortBy("src")
        .option("path", s"$out/$name")
        .saveAsTable(s"ewp_$name")
      val (nf, nt) = files(s"$out/$name")
      println(s"[ewp] $name: $nf files from $nt tasks")
    }
    val (plan, scratch) = Graph.edgeFracsPlan(spark, dir)
    writeB("rawplan", plan)
    plan.write.mode("overwrite").parquet(s"$out/flat")
    Dedup.unpersistIds(spark, scratch)
    writeB("fromfile", spark.read.parquet(s"$out/flat"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (plan2, scratch2) = Graph.edgeFracsPlan(spark, dir)
    writeB("rawplan_noaqe", plan2)
    Dedup.unpersistIds(spark, scratch2)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.localShuffleReader.enabled", "false")
    val (plan3, scratch3) = Graph.edgeFracsPlan(spark, dir)
    writeB("rawplan_nolocalread", plan3)
    Dedup.unpersistIds(spark, scratch3)
    spark.conf.set("spark.sql.adaptive.localShuffleReader.enabled", "true")
    // clone-session variant: the conf flip isolated from the session
    // (what a concurrent-chain writer must use)
    val wspark = spark.newSession()
    wspark.conf.set("spark.sql.adaptive.localShuffleReader.enabled", "false")
    val (plan4, scratch4) = Graph.edgeFracsPlan(wspark, dir)
    spark.sql("DROP TABLE IF EXISTS ewp_clone")
    plan4.repartition(n, col("src"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(n, "src").sortBy("src")
      .option("path", s"$out/clone")
      .saveAsTable("ewp_clone")
    Dedup.unpersistIds(wspark, scratch4)
    val (nf4, nt4) = files(s"$out/clone")
    println(s"[ewp] clone-session: $nf4 files from $nt4 tasks; parent sees table: " +
      spark.table("ewp_clone").count())
    spark.stop()
  }
}
