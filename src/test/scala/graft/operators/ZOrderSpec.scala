package graft.operators

import graft.SparkSpec

/** Z-order layout — morton-code invariants and the pruning win the
  * operator exists for. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton code interleaves bits (known values)") {
    val z = ZOrder.mortonExpr("qx", "qy", (a, b) => s"($a div $b)")
    val out = spark.sql(
      s"""SELECT qx, qy, $z AS zc FROM VALUES
         |  (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
         |  (1, 0), (0, 1), (1, 1), (3, 5), (65535, 65535)
         |  AS t(qx, qy)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 0L)) == 0L)
    assert(out((1L, 0L)) == 2L)      // x in odd bits
    assert(out((0L, 1L)) == 1L)      // y in even bits
    assert(out((1L, 1L)) == 3L)
    // 3=0b011, 5=0b101 → interleave x odd / y even: 0b011011 = 27? no:
    // bits: i=0 x1*2 + y1*1 = 3; i=1 x1*8 + y0*4 = 8; i=2 x0*32 + y1*16 = 16 → 27
    assert(out((3L, 5L)) == 27L)
    assert(out((65535L, 65535L)) == (1L << 32) - 1)
  }

  test("z-order layout beats a linear custkey sort on the date dimension") {
    val dir = "/root/testdata/sf0.01"
    val zoned = ZOrder.zorderLayout(spark, dir)
      .selectExpr("file_id", "od_hi - od_lo AS od_span").as[(Long, Long)].collect()
    // the same 64-file split ordered by custkey alone: every file spans
    // essentially the full date range
    val linear = spark.sql(
      s"""SELECT file_id, MAX(od) - MIN(od) AS od_span FROM (
         |  SELECT CAST(NTILE(64) OVER (ORDER BY o_custkey, o_orderkey) AS BIGINT) AS file_id,
         |    CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT) AS od
         |  FROM parquet.`$dir/orders.parquet`
         |) GROUP BY file_id""".stripMargin).as[(Long, Long)].collect()
    val zAvg = zoned.map(_._2).sum.toDouble / zoned.length
    val lAvg = linear.map(_._2).sum.toDouble / linear.length
    // each z-file should cover a small fraction of the date range the
    // linear layout's files cover — that fraction IS the scan pruning
    assert(zAvg < lAvg * 0.5,
      s"z-order avg date span $zAvg not < half of linear $lAvg")
  }

  test("blockCumsum file assignment equals NTILE exactly (the oracle's spelling)") {
    // the registered plan computes NTILE(64)'s values via a distributed
    // global rank + closed-form bucket math; the DuckDB oracle still
    // spells it NTILE — this pins the two spellings to the same zone
    // map, per file, at a gate SF
    val dir = "/root/testdata/sf0.01"
    val viaRank = ZOrder.zorderLayout(spark, dir)
      .selectExpr("file_id", "n_rows", "ck_lo", "ck_hi", "od_lo", "od_hi")
      .collect().map(_.toSeq).toSeq
    val ntile = spark.sql(
      s"""WITH o AS (
         |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS ck,
         |    CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT) AS od
         |  FROM parquet.`$dir/orders.parquet`
         |), ext AS (
         |  SELECT MIN(ck) AS ck_min, MAX(ck) AS ck_max,
         |         MIN(od) AS od_min, MAX(od) AS od_max FROM o
         |), q AS (
         |  SELECT o_orderkey, ck, od,
         |    (((ck - ck_min) * ${ZOrder.Grid}) div (ck_max - ck_min + 1)) AS qx,
         |    (((od - od_min) * ${ZOrder.Grid}) div (od_max - od_min + 1)) AS qy
         |  FROM o CROSS JOIN ext
         |), z AS (
         |  SELECT ck, od, CAST(NTILE(${ZOrder.Files}) OVER (ORDER BY
         |    ${ZOrder.mortonExpr("qx", "qy", (a, b) => s"($a div $b)")}, o_orderkey)
         |    AS BIGINT) AS file_id
         |  FROM q
         |)
         |SELECT file_id, COUNT(*) AS n_rows,
         |  MIN(ck) AS ck_lo, MAX(ck) AS ck_hi,
         |  MIN(od) AS od_lo, MAX(od) AS od_hi
         |FROM z GROUP BY file_id ORDER BY file_id""".stripMargin)
      .collect().map(_.toSeq).toSeq
    assert(viaRank == ntile)
  }

  test("zorderWrite: production range-partitioned layout conserves rows and beats linear pruning") {
    val dir = "/root/testdata/sf0.01"
    val out = java.nio.file.Files.createTempDirectory("graft-zw").toString + "/orders_z"
    val zones = ZOrder.zorderWrite(spark, dir, out)
      .selectExpr("n_rows", "od_hi - od_lo AS od_span").as[(Long, Long)].collect()
    val total = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(zones.map(_._1).sum == total, "written layout must conserve rows")
    assert(zones.length == ZOrder.Files, s"expected ${ZOrder.Files} files, got ${zones.length}")
    // the sampled range boundaries aren't the NTILE boundaries, but the
    // pruning property must hold all the same: each z-file covers a
    // small fraction of the date range a custkey-linear file covers
    val linear = spark.sql(
      s"""SELECT MAX(od) - MIN(od) FROM (
         |  SELECT CAST(NTILE(${ZOrder.Files}) OVER (ORDER BY o_custkey, o_orderkey) AS BIGINT) AS f,
         |    CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT) AS od
         |  FROM parquet.`$dir/orders.parquet`) GROUP BY f""".stripMargin)
      .as[Long].collect()
    val zAvg = zones.map(_._2).sum.toDouble / zones.length
    val lAvg = linear.sum.toDouble / linear.length
    assert(zAvg < lAvg * 0.5,
      s"written z-layout avg date span $zAvg not < half of linear $lAvg")
  }

  test("every row lands in exactly one file and counts are balanced") {
    val dir = "/root/testdata/sf0.001"
    val rows = ZOrder.zorderLayout(spark, dir)
      .selectExpr("n_rows").as[Long].collect()
    val total = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(rows.sum == total)
    assert(rows.max - rows.min <= 1, "NTILE buckets must differ by at most 1")
  }
}
