package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: A/B the jaccardPairTable's shingle-stats stage — the
  * current two-window pass (sorts the whole index by shingle) vs a
  * hash-agg + shuffle-hash join-back (no sort). Both produce
  * bit-identical stats (count/min are exact), so the cheaper plan can
  * swap in without touching the artifact or its oracles.
  *
  * sbt "runMain graft.operators.PairBuildProbe /root/testdata/sf0.1"
  */
object PairBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val c0 = bean.getProcessCpuTime
      val r = f
      println(f"[probe] $tag%-46s wall ${(System.nanoTime() - t0) / 1e9}%7.3f s  cpu ${(bean.getProcessCpuTime - c0) / 1e9}%7.2f s")
      r
    }
    // stage the shingle index once (its own artifact, outside the A/B)
    val idx0 = Dedup.shingleIndex(spark, dir)
    t("shingleIndex build (shared)")(idx0.count())

    (1 to 2).foreach { rnd =>
      val w = Window.partitionBy(col("shingle"))
      t(s"A window stats (count+min over shingle) r$rnd") {
        idx0.withColumn("df", count(lit(1)).over(w))
          .withColumn("min_id", min(col("doc_id")).over(w))
          .select(max(col("df")), min(col("min_id"))).count()
      }
      t(s"B agg+join stats r$rnd") {
        val stats = idx0.groupBy("shingle")
          .agg(count(lit(1)).as("df"), min(col("doc_id")).as("min_id"))
        idx0.join(stats, Seq("shingle"))
          .select(max(col("df")), min(col("min_id"))).count()
      }
    }

    // full pair-table builds under each formulation
    def pairTable(idx: org.apache.spark.sql.DataFrame) = {
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
    val w = Window.partitionBy(col("shingle"))
    val idxWin = idx0
      .withColumn("df", count(lit(1)).over(w))
      .withColumn("min_id", min(col("doc_id")).over(w))
    val stats = idx0.groupBy("shingle")
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("min_id"))
    val idxAgg = idx0.join(stats, Seq("shingle"))
    (1 to 2).foreach { rnd =>
      val ha = t(s"A FULL pair build (window) r$rnd") {
        val df = pairTable(idxWin)
        df.agg(count(lit(1)), sum(col("n_common")), sum(round(col("jaccard"), 9))).head
      }
      val hb = t(s"B FULL pair build (agg+join) r$rnd") {
        val df = pairTable(idxAgg)
        df.agg(count(lit(1)), sum(col("n_common")), sum(round(col("jaccard"), 9))).head
      }
      println(s"[probe]   A=$ha")
      println(s"[probe]   B=$hb  identical=${ha == hb}")
    }
    spark.stop()
  }
}
