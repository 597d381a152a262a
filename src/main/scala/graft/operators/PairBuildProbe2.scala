package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Dev probe: stage-by-stage CPU dissection of jaccardPairTable (the
  * #1 item of the index job's CPU budget at ~21 CPU-s steady).
  * Hypothesis under test: the per-shingle (df, min_id) WINDOW pass is
  * recomputed for each of its three consumers (small a-leg, small
  * b-leg, star candidates), and an aggregate+join formulation with a
  * checkpointed stats table is cheaper.
  *
  * sbt "runMain graft.operators.PairBuildProbe2 /root/testdata/sf0.1"
  */
object PairBuildProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) cpuNs.addAndGet(m.executorCpuTime)
      }
    })
    spark.range(1 << 20).selectExpr("sum(id)").count()
    def t(name: String)(f: => Any): Unit = {
      Thread.sleep(300)
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      val n = f
      Thread.sleep(300)
      println(f"[pbp] $name%-30s ${(System.nanoTime() - t0) / 1e9 - 0.3}%6.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%6.2f s  ($n)")
    }

    (1 to 2).foreach { rep =>
      println(s"[pbp] === rep $rep ===")
      t("docShingles") { Dedup.docShingles(spark, dir).count() }
      t("shingleIndex") { Dedup.shingleIndex(spark, dir).count() }
      val si = Dedup.shingleIndex(spark, dir)

      // current formulation pieces
      val w = Window.partitionBy(col("shingle"))
      val idxW = si
        .withColumn("df", count(lit(1)).over(w))
        .withColumn("min_id", min(col("doc_id")).over(w))
      t("window pass once (count)") { idxW.count() }

      // aggregate formulation: per-shingle stats table, then join back
      val stats0 = si.groupBy("shingle")
        .agg(count(lit(1)).as("df"), min(col("doc_id")).as("min_id"))
      t("stats agg (count)") { stats0.count() }
      val stats = Dedup.checkpointSer(stats0)
      t("stats checkpointSer") { stats.count() }
      val idxJ = Dedup.checkpointSer(si.join(stats, "shingle"))
      t("idx join-back + ckpt") { idxJ.count() }

      def pairsFrom(idx: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val small = idx.filter(col("df") <= Dedup.MaxShingleDf)
        val a = small.select(col("doc_id").as("id_a"), col("n_sh").as("n_a"), col("shingle"))
        val b = small.select(col("doc_id").as("id_b"), col("n_sh").as("n_b"), col("shingle"))
        val smallRows = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
            lit(null).cast("long").as("star_common"))
        val starCands = idx.filter(col("df") > Dedup.MaxShingleDf)
          .filter(col("doc_id") =!= col("min_id"))
          .select(col("min_id").as("id_a"), col("doc_id").as("id_b"))
          .distinct()
        val sh = Dedup.docShingles(spark, dir)
        val shA = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
        val shB = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
        val starRows = starCands.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            size(col("sh_a")).cast("long").as("n_a"),
            size(col("sh_b")).cast("long").as("n_b"),
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("star_common"))
        smallRows.unionByName(starRows)
          .groupBy("id_a", "id_b")
          .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
            count(when(col("star_common").isNull, 1)).as("small_common"),
            max(col("star_common")).as("star_max"))
          .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
            greatest(col("small_common"), coalesce(col("star_max"), lit(0L)))
              .as("n_common"))
          .withColumn("jaccard",
            col("n_common").cast("double") /
              (col("n_a") + col("n_b") - col("n_common")))
      }
      t("pairs from WINDOW idx") { pairsFrom(idxW).count() }
      t("pairs from CKPT-JOIN idx") { pairsFrom(idxJ).count() }
      Dedup.memoDrop(spark, s"jaccardPairs|$dir")
      t("current jaccardPairTable") { Dedup.jaccardPairTable(spark, dir).count() }
      Dedup.releaseIndexes(spark)
    }
    spark.stop()
  }
}
