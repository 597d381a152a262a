package graft.operators

/** Dev probe: time the PageRank superstep loop cold vs warm vs primed
  * (parquet-served edge artifact) — attributes superstep cost so a
  * bench regression names its stage.
  *
  * sbt "runMain graft.operators.GraphProbe /root/testdata/sf0.1 [indexDir]"
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    t("edgeFracs build (memo)")(Graph.edgeFracs(spark, dir).count())
    t("pagerank warm (SER memo)")(Graph.pagerank(spark, dir).collect())
    t("degree warm (SER memo)")(Graph.degreeHistogram(spark, dir).collect())
    if (args.length > 1) {
      val idx = args(1)
      t("writeIndexes")(Dedup.writeIndexes(spark, dir, idx))
      Dedup.releaseIndexes(spark)
      t("primeIndexes")(Dedup.primeIndexes(spark, dir, idx))
      t("pagerank primed (parquet)")(Graph.pagerank(spark, dir).collect())
      t("pagerank primed 2")(Graph.pagerank(spark, dir).collect())
      t("degree primed")(Graph.degreeHistogram(spark, dir).collect())
      // per-phase breakdown under primed serving
      import org.apache.spark.sql.functions._
      val en = Graph.edgeFracs(spark, dir)
      t("primed edge count")(en.count())
      val nodes2 = t("nodes chk2")(Dedup.checkpointSer(
        en.select(col("src").as("node")).distinct()))
      val cnt = nodes2.agg(count(lit(1)).as("n"))
      var rank = nodes2.crossJoin(broadcast(cnt))
        .select(col("node"), (lit(1.0) / col("n")).as("r"))
      rank = t("rank0 chk")(Dedup.checkpointSer(rank))
      for (i <- 1 to 3) {
        val contrib = en.join(broadcast(rank), col("node") === col("src"))
          .select(col("dst"),
            round(col("r") * col("frac"), 9).cast("decimal(29,9)").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("sc"))
        val bc = t(s"iter$i contrib collect")(contrib.collect())
        rank = t(s"iter$i rank chk")(Dedup.checkpointSer(
          nodes2.crossJoin(broadcast(cnt))
            .join(broadcast(contrib), col("node") === col("dst"), "left")
            .select(col("node"),
              (lit(Graph.Teleport) / col("n") + lit(Graph.Damping) *
                coalesce(col("sc"), lit(0).cast("decimal(38,9)")).cast("double"))
                .as("r"))))
      }
    }
    spark.stop()
  }
}
