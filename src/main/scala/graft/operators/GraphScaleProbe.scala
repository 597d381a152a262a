package graft.operators

import org.apache.spark.sql.functions._

/** Dev probe: the round-12 graph scale measurements at the 10× tier —
  * (a) broadcast vs co-partitioned superstep wall on a 10×-node,
  * 10×-edge transaction graph (the path that takes over past
  * [[Graph.BroadcastMaxNodes]]), (b) appendGraphEdges (delta batch)
  * vs a full edge-artifact rebuild.
  *
  * The 10× corpus replicates sf0.1 orders/lineitem ten times with
  * key offsets, so node count AND edge count both scale 10× (distinct
  * customers/suppliers per replica).
  *
  * sbt "runMain graft.operators.GraphScaleProbe /root/testdata/sf0.1"
  */
object GraphScaleProbe {
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
      println(f"[probe] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_graph10x").toString
    val o = spark.read.parquet(s"$src/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val l = spark.read.parquet(s"$src/lineitem.parquet")
      .select("l_orderkey", "l_suppkey")
    val maxO = o.agg(max("o_orderkey")).head.getLong(0) + 1
    val maxC = o.agg(max("o_custkey")).head.getLong(0) + 1
    val maxS = l.agg(max("l_suppkey")).head.getLong(0) + 1
    val rep = spark.range(10).select(col("id").as("r"))
    t("generate 10x orders/lineitem") {
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
      Graph.edgeFracs(spark, dir).count()
    }
    t("pagerank BROADCAST superstep x10") {
      Graph.pagerankFullForced(spark, dir, coPartition = false).count()
    }
    t("pagerank CO-PARTITIONED x10 (incl. by-src layout build)") {
      Graph.pagerankFullForced(spark, dir, coPartition = true).count()
    }
    t("pagerank CO-PARTITIONED x10 (warm layout)") {
      Graph.pagerankFullForced(spark, dir, coPartition = true).count()
    }
    // parity at scale, not just the toy spec graph
    val b = Graph.pagerankFullForced(spark, dir, coPartition = false)
      .agg(sum(col("r")), count(lit(1))).head
    val c = Graph.pagerankFullForced(spark, dir, coPartition = true)
      .agg(sum(col("r")), count(lit(1))).head
    println(s"[probe] parity: broadcast=(${b.getDouble(0)}, ${b.getLong(1)}) " +
      s"copart=(${c.getDouble(0)}, ${c.getLong(1)})")
    // append vs rebuild: artifact from orders < 9*maxO, then append
    // the last replica as the delta batch
    val idx = java.nio.file.Files.createTempDirectory("graft_graph10x_idx").toString
    val dirOld = java.nio.file.Files.createTempDirectory("graft_graph10x_old").toString
    spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") < 9L * maxO)
      .write.mode("overwrite").parquet(s"$dirOld/orders.parquet")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.mode("overwrite").parquet(s"$dirOld/lineitem.parquet")
    t("edge artifact from 9/10 corpus") {
      Dedup.releaseIndexes(spark)
      Graph.edgeFracs(spark, dirOld).write.mode("overwrite")
        .parquet(s"$idx/graphEdgeFracs.parquet/batch_id=base")
    }
    t("appendGraphEdges (1/10 delta batch)") {
      Graph.appendGraphEdges(spark, dir, idx, col("o_orderkey") >= 9L * maxO)
    }
    t("full rebuild (for comparison)") {
      Dedup.memoDrop(spark, s"graphEdgeFracs|$dir")
      Graph.edgeFracs(spark, dir).count()
    }
    spark.stop()
  }
}
