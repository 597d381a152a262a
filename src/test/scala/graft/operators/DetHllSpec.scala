package graft.operators

import graft.SparkSpec

/** Deterministic HLL — accuracy, branch coverage, and the integer-domain
  * invariants that make the DuckDB oracle replay exact. */
class DetHllSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal orders table: one (custkey, priority) row per element. */
  private def ordersDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dethll").toString
    rows.zipWithIndex
      .map { case ((ck, pr), i) => (i.toLong, ck, pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("estimate within 5% of exact on both correction branches") {
    // small group (500 distinct → linear-counting branch, raw <= 2.5m)
    // large group (20000 distinct → raw HLL branch)
    val rows =
      (0 until 500).map(i => (i.toLong, "A-SMALL")) ++
        (0 until 20000).map(i => (i.toLong + 1000000, "B-LARGE"))
    val dir = ordersDir(rows)
    val out = DetHll.hllDeterministic(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(math.abs(out("A-SMALL") - 500.0) / 500.0 < 0.05,
      s"small-branch estimate ${out("A-SMALL")} off >5% from 500")
    assert(math.abs(out("B-LARGE") - 20000.0) / 20000.0 < 0.05,
      s"large-branch estimate ${out("B-LARGE")} off >5% from 20000")
  }

  test("duplicates do not move the estimate (distinct semantics)") {
    val once = ordersDir((0 until 3000).map(i => (i.toLong, "P")))
    val thrice = ordersDir(
      (0 until 3000).flatMap(i => Seq.fill(3)((i.toLong, "P"))))
    val a = DetHll.hllDeterministic(spark, once).as[(String, Long)].collect()
    val b = DetHll.hllDeterministic(spark, thrice).as[(String, Long)].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("partition layout does not move the estimate (register math exact)") {
    // float-summed registers would drift with partial-agg order; the
    // DECIMAL integer-domain sum must be bit-stable across layouts
    val rows = (0 until 5000).map(i => (i.toLong * 7919, "P"))
    val dir1 = ordersDir(rows)
    val dir32 = java.nio.file.Files.createTempDirectory("graft-dethll").toString
    spark.read.parquet(s"$dir1/orders.parquet").repartition(32)
      .write.mode("overwrite").parquet(s"$dir32/orders.parquet")
    val a = DetHll.hllDeterministic(spark, dir1).as[(String, Long)].collect()
    val b = DetHll.hllDeterministic(spark, dir32).as[(String, Long)].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("hash stays in [0, 2^62) and is collision-free on a 100k id sample") {
    val h = DetHll.h62("CAST(id AS BIGINT)", DetHll.sparkOps)
    val hs = spark.range(100000).selectExpr(s"$h AS h").as[Long].collect()
    assert(hs.forall(v => v >= 0 && v < (1L << 62)))
    assert(hs.distinct.length == hs.length, "62-bit hash collided on 100k ids")
  }

  test("rank CASE covers the exact power-of-two boundaries") {
    val rc = DetHll.rankCase("rem")
    val out = spark.sql(
      s"""SELECT rem, $rc AS rnk FROM VALUES
         |  (CAST(0 AS BIGINT)), (1), (${1L << 49}), (${(1L << 49) - 1}),
         |  (${(1L << 50) - 1}) AS t(rem)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(0L) == 51)               // all-zero remainder
    assert(out(1L) == 50)               // lowest bit only
    assert(out(1L << 49) == 1)          // top bit set
    assert(out((1L << 49) - 1) == 2)    // just below the top bit
    assert(out((1L << 50) - 1) == 1)
  }

  test("keys past 2^31 fold without overflow and still count") {
    // a key domain that would overflow a naive 32-bit-assuming multiply
    val rows = (0 until 2000).map(i => ((1L << 40) + i * 1000003L, "BIG"))
    val out = DetHll.hllDeterministic(spark, ordersDir(rows))
      .as[(String, Long)].collect().toMap
    assert(math.abs(out("BIG") - 2000.0) / 2000.0 < 0.05)
  }
  test("count-min: never underestimates, and is near-exact on real data") {
    val out = DetCms.cmsHeavyHitters(spark, sf("sf0.001")).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"CM must never underestimate: $r")
      assert(over == est - exact)
      // w = 1024 counters against a sf0.001 key space: collisions add
      // at most a few spurious counts for the heavy keys
      assert(over <= exact, s"estimate error implausibly large: $r")
    }
  }

  test("count-min: planted heavy key surfaces with an exact-or-over estimate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cms").toString
    // key 42 occurs 50 times; keys 1..20 once each
    val rows = Seq.fill(50)(42L) ++ (1L to 20L)
    rows.zipWithIndex.map { case (ck, i) =>
      (i.toLong, ck, "O", "1-URGENT", f"1995-01-${i % 28 + 1}%02d", 100.0)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_orderdate", "o_totalprice")
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "CAST(o_orderdate AS DATE) o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val top = DetCms.cmsHeavyHitters(spark, dir).collect()
    assert(top.head.getLong(0) == 42L && top.head.getLong(1) == 50L)
    assert(top.head.getLong(2) >= 50L)
  }
}
