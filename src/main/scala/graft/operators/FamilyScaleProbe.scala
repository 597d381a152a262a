package graft.operators

import org.apache.spark.sql.functions._

/** Dev probe: the round-14 ≥100× scale measurements for the two
  * non-ANN serving families the ServeScaleProbe does not cover —
  *
  *  (a) PAIR TABLE: a 100× documents corpus (each base doc replicated
  *      with one perturbed token — true near-dup clusters, so shingle
  *      df blows through MaxShingleDf and the star cap carries the
  *      load exactly as it would on templated web data), pair-table
  *      build wall, then `q_dedup_jaccard` served off the parquet-
  *      primed pair artifact (the bench's steady state): serving is a
  *      scan + TakeOrderedAndProject over the artifact, so the
  *      expectation to verify is artifact-size-linear, trivially
  *      parallel, and independent of the raw corpus.
  *
  *  (b) GRAPH: a 100× transaction graph (~1.6M nodes, ~120M directed
  *      edge rows — past BroadcastMaxNodes, so the co-partitioned
  *      superstep path engages naturally), by-src layout build, warm
  *      global PageRank, and PPR with/without the round-14 frontier
  *      pruning (zero-rank nodes dropped from the contribution join —
  *      bit-exact, see rankLoopOver).
  *
  * sbt "runMain graft.operators.FamilyScaleProbe /root/testdata/sf0.1 100"
  */
object FamilyScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 100
    val which = if (args.length > 2) args(2) else "both" // pairs|graph|both
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-52s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }

    if (which == "pairs" || which == "both") {
      val dir = java.nio.file.Files.createTempDirectory("graft_pair100x").toString
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val nDocs = docs.count()
      val rep = spark.range(mult).select(col("id").as("r"))
      t(s"generate ${mult}x documents (${mult * nDocs} docs)") {
        docs.crossJoin(rep)
          .select((col("doc_id") + col("r") * nDocs).as("doc_id"),
            concat(col("text"), lit(" rep"), col("r").cast("string")).as("text"),
            col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      val idx = java.nio.file.Files.createTempDirectory("graft_pair100x_idx").toString
      t(s"pair-table build (shingle chain, ${mult}x)") {
        println(s"[probe]   pair rows: ${Dedup.jaccardPairTable(spark, dir).count()}")
      }
      t("pair artifact write") {
        Dedup.jaccardPairTable(spark, dir)
          .write.mode("overwrite").parquet(s"$idx/jaccardPairs.parquet")
      }
      Dedup.releaseIndexes(spark)
      Dedup.memoPut(spark, s"jaccardPairs|$dir",
        spark.read.parquet(s"$idx/jaccardPairs.parquet"))
      t("q_dedup_jaccard serving WARM-UP (primed artifact)") {
        Dedup.jaccardPairs(spark, dir).count()
      }
      (1 to 2).foreach(i => t(s"q_dedup_jaccard serving sample $i") {
        Dedup.jaccardPairs(spark, dir).count()
      })
      // containment rides the same artifact — one extra serving leg
      (1 to 2).foreach(i => t(s"q_dedup_containment serving sample $i") {
        Dedup.containmentPairs(spark, dir).count()
      })
      Dedup.releaseIndexes(spark)
    }

    if (which == "graph" || which == "both") {
      val dir = java.nio.file.Files.createTempDirectory("graft_graph100x").toString
      val o = spark.read.parquet(s"$src/orders.parquet")
        .select("o_orderkey", "o_custkey")
      val l = spark.read.parquet(s"$src/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
      val maxO = o.agg(max("o_orderkey")).head.getLong(0) + 1
      val maxC = o.agg(max("o_custkey")).head.getLong(0) + 1
      val maxS = l.agg(max("l_suppkey")).head.getLong(0) + 1
      val rep = spark.range(mult).select(col("id").as("r"))
      t(s"generate ${mult}x orders/lineitem") {
        o.crossJoin(rep)
          .select((col("o_orderkey") + col("r") * maxO).as("o_orderkey"),
            (col("o_custkey") + col("r") * maxC).as("o_custkey"))
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        l.crossJoin(rep)
          .select((col("l_orderkey") + col("r") * maxO).as("l_orderkey"),
            (col("l_suppkey") + col("r") * maxS).as("l_suppkey"))
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      }
      t("edge artifact build (memo)") {
        println(s"[probe]   edge rows: ${Graph.edgeFracs(spark, dir).count()}")
      }
      t("global pagerank COLD (incl. by-src layout build)") {
        Graph.pagerank(spark, dir).count()
      }
      t("global pagerank WARM (primed by-src layout)") {
        Graph.pagerank(spark, dir).count()
      }
      t("PPR pruned (frontier join)") {
        Graph.pagerankPersonalizedAt(spark, dir, 6, prune = true).count()
      }
      t("PPR unpruned (full-graph join)") {
        Graph.pagerankPersonalizedAt(spark, dir, 6, prune = false).count()
      }
      t("LPA communities (4 supersteps, warm by-src layout)") {
        Graph.labelPropagation(spark, dir).count()
      }
      Dedup.releaseIndexes(spark)
    }
    spark.stop()
  }
}
