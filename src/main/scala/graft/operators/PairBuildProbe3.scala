package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Dev probe: variant shootout for the pair-table build under FULL
  * materialization (noop sink — count() prunes the agg columns and
  * under-reports by ~2×). Variants:
  *   cur    — production jaccardPairTable formulation (string shingles,
  *            window df/min, a⋈b self-join)
  *   hash   — same shape, shingles pre-hashed to xxhash64 longs
  *   comb   — per-shingle collect_list + pair-combination explode
  *            (one shuffle, emits C(df,2) directly), string shingles
  *   hashcomb — both
  *
  * sbt "runMain graft.operators.PairBuildProbe3 /root/testdata/sf0.1"
  */
object PairBuildProbe3 {
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
      println(f"[pb3] $name%-24s ${(System.nanoTime() - t0) / 1e9 - 0.3}%6.2f s  cpu ${(cpuNs.get() - c0) / 1e9}%6.2f s  ($n)")
    }
    def mat(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }

    def pairAgg(smallRows: DataFrame, starRows: DataFrame): DataFrame =
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

    def starFrom(idx: DataFrame, sh: DataFrame): DataFrame = {
      val starCands = idx.filter(col("df") > Dedup.MaxShingleDf)
        .filter(col("doc_id") =!= col("min_id"))
        .select(col("min_id").as("id_a"), col("doc_id").as("id_b"))
        .distinct()
      val shA = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val shB = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
      starCands.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(col("sh_a")).cast("long").as("n_a"),
          size(col("sh_b")).cast("long").as("n_b"),
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("star_common"))
    }

    def joinSmall(idx: DataFrame): DataFrame = {
      val small = idx.filter(col("df") <= Dedup.MaxShingleDf)
      val a = small.select(col("doc_id").as("id_a"), col("n_sh").as("n_a"), col("shingle"))
      val b = small.select(col("doc_id").as("id_b"), col("n_sh").as("n_b"), col("shingle"))
      a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
          lit(null).cast("long").as("star_common"))
    }

    // combinations: per shingle, collect (doc_id, n_sh) sorted by id,
    // explode ordered pairs (i < j) via nested transform+flatten
    def combSmall(idx: DataFrame): DataFrame = {
      val grouped = idx.filter(col("df") <= Dedup.MaxShingleDf)
        .groupBy("shingle")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("ds"))
      grouped.select(explode(flatten(transform(
          sequence(lit(1), size(col("ds")) - 1),
          i => transform(sequence(i + 1, size(col("ds"))),
            j => struct(
              element_at(col("ds"), i).getField("doc_id").as("id_a"),
              element_at(col("ds"), j).getField("doc_id").as("id_b"),
              element_at(col("ds"), i).getField("n_sh").cast("long").as("n_a"),
              element_at(col("ds"), j).getField("n_sh").cast("long").as("n_b")))))).as("p"))
        .select(col("p.id_a"), col("p.id_b"), col("p.n_a"), col("p.n_b"),
          lit(null).cast("long").as("star_common"))
    }

    (1 to 2).foreach { rep =>
      println(s"[pb3] === rep $rep ===")
      // warm shared inputs
      Dedup.shingleIndex(spark, dir).count()
      val si = Dedup.shingleIndex(spark, dir)
      val sh = Dedup.docShingles(spark, dir)
      val w = Window.partitionBy(col("shingle"))
      val idxW = si.withColumn("df", count(lit(1)).over(w))
        .withColumn("min_id", min(col("doc_id")).over(w))
      t("cur smallRows") { mat(joinSmall(idxW)) }
      t("cur starRows") { mat(starFrom(idxW, sh)) }
      t("cur full") { mat(pairAgg(joinSmall(idxW), starFrom(idxW, sh))) }
      t("cur full+ckpt") { Dedup.checkpointSer(
        pairAgg(joinSmall(idxW), starFrom(idxW, sh))).count() }

      // hashed variants: one cheap projection layer over the memo
      val siH = si.withColumn("shingle", xxhash64(col("shingle")))
      val shH = sh.withColumn("sh",
        transform(col("sh"), s => xxhash64(s)))
      val idxH = siH.withColumn("df", count(lit(1)).over(w))
        .withColumn("min_id", min(col("doc_id")).over(w))
      t("hash smallRows") { mat(joinSmall(idxH)) }
      t("hash full") { mat(pairAgg(joinSmall(idxH), starFrom(idxH, shH))) }
      t("hash full+ckptSer") { Dedup.checkpointSer(
        pairAgg(joinSmall(idxH), starFrom(idxH, shH))).count() }
      t("hash full+persistCount") {
        val d = pairAgg(joinSmall(idxH), starFrom(idxH, shH))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        val n = d.count(); d.unpersist(); n
      }
      Dedup.releaseIndexes(spark)
    }
    spark.stop()
  }
}
