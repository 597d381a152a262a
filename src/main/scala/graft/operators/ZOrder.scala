package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Z-order (Morton space-filling curve) data layout — the multi-column
  * file-clustering operator a 100 TB lakehouse uses so that min/max
  * zone maps prune scans on EVERY clustered dimension, not just the
  * leading sort key (Morton 1966; the technique behind
  * Delta/Iceberg OPTIMIZE ZORDER BY).
  *
  * A linear sort on (a, b) gives perfect pruning on `a` and none on
  * `b`; interleaving the bits of both dimensions gives every file a
  * tight hyper-rectangle in BOTH, so a predicate on either column
  * skips most files at the manifest level — the scan never starts.
  *
  * Pipeline (everything integer-exact so the DuckDB oracle replays it
  * bit-for-bit, same discipline as [[DetHll]]):
  *  1. min/max of each dimension via a 1-row aggregate broadcast back
  *     onto the fact rows (the house crossJoin-of-a-total pattern).
  *  2. quantize each dimension to 16 bits with pure integer math:
  *     q = (v - min) * 65536 div (max - min + 1). Products stay below
  *     2^47 — safe in both engines' signed-64 arithmetic.
  *  3. Morton-interleave the two 16-bit grids into a 32-bit z-code:
  *     Σ bit_i(qx)·2^(2i+1) + bit_i(qy)·2^(2i) — 64 generated integer
  *     terms, engine-parameterized only in the spelling of integer
  *     division ([[DetHll.Ops]]).
  *  4. deterministic file assignment: NTILE(64) over (z, unique key) —
  *     the tie-break makes bucket boundaries reproducible, which is
  *     what lets the oracle hash-match. Production writes with
  *     repartitionByRange(z).sortWithinPartitions(z) instead (sampled
  *     range boundaries — same layout, not bit-reproducible, so the
  *     gate query uses NTILE).
  *  5. per-file zone map: count + min/max of BOTH dimensions — the
  *     exact statistics a reader's manifest would hold. Tightness of
  *     these ranges IS the operator's product; ZOrderSpec pins that the
  *     z-ordered layout beats the linear layout's per-file spans on the
  *     non-leading dimension.
  *
  * Scale posture: one 1-row aggregate (broadcast), one total sort
  * (range-exchange) — identical shuffle structure to any global
  * ORDER BY write. The z-code itself is a narrow codegen projection;
  * no joins, no explosion. At 100 TB this runs as the scheduled
  * OPTIMIZE job that rewrites cold partitions.
  */
object ZOrder {

  val Bits = 16          // per-dimension quantization grid
  val Grid: Long = 1L << Bits
  val Files = 64         // zone-map buckets the gate query reports

  /** Integer min-max quantizer to [0, 2^16): exact in both engines. */
  private def quant(v: String, vMin: String, vMax: String): String =
    s"((($v - $vMin) * $Grid) div ($vMax - $vMin + 1))"

  private def quantDuck(v: String, vMin: String, vMax: String): String =
    s"((($v - $vMin) * $Grid) // ($vMax - $vMin + 1))"

  /** Morton interleave of two [[Bits]]-bit grids; `idiv` spells the
    * engine's integer division. x occupies odd bits, y even. */
  def mortonExpr(qx: String, qy: String, idiv: (String, Long) => String): String = {
    val terms = (0 until Bits).flatMap { i =>
      Seq(
        s"((${idiv(qx, 1L << i)}) % 2) * ${1L << (2 * i + 1)}",
        s"((${idiv(qy, 1L << i)}) % 2) * ${1L << (2 * i)}")
    }
    s"(${terms.mkString(" + ")})"
  }

  private val sparkDiv: (String, Long) => String = (a, b) => s"($a div $b)"
  private val duckDiv: (String, Long) => String = (a, b) => s"($a // $b)"

  /** Zone-map report of a Z-ordered orders layout over
    * (o_custkey, day(o_orderdate)): [[Files]] rows of per-file count +
    * min/max of both clustered dimensions. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .selectExpr("o_orderkey", "CAST(o_custkey AS BIGINT) AS ck",
        "CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT) AS od")
    val ext = o.agg(
      min("ck").as("ck_min"), max("ck").as("ck_max"),
      min("od").as("od_min"), max("od").as("od_max"))
    val z = o.crossJoin(broadcast(ext))
      .selectExpr("o_orderkey", "ck", "od",
        s"${quant("ck", "ck_min", "ck_max")} AS qx",
        s"${quant("od", "od_min", "od_max")} AS qy")
      .selectExpr("o_orderkey", "ck", "od",
        s"${mortonExpr("qx", "qy", sparkDiv)} AS z")
      .selectExpr("o_orderkey", "ck", "od",
        // cast: Spark's NTILE yields INT, DuckDB's BIGINT — the gate
        // compares dtypes, so both sides finish in BIGINT
        s"CAST(NTILE($Files) OVER (ORDER BY z, o_orderkey) AS BIGINT) AS file_id")
    z.groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("ck").as("ck_lo"), max("ck").as("ck_hi"),
        min("od").as("od_lo"), max("od").as("od_hi"))
      .orderBy("file_id")
  }

  def oracle: String =
    s"""WITH o AS (
       |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS ck,
       |    CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS od
       |  FROM orders
       |), ext AS (
       |  SELECT MIN(ck) AS ck_min, MAX(ck) AS ck_max,
       |         MIN(od) AS od_min, MAX(od) AS od_max FROM o
       |), q AS (
       |  SELECT o_orderkey, ck, od,
       |    ${quantDuck("ck", "ck_min", "ck_max")} AS qx,
       |    ${quantDuck("od", "od_min", "od_max")} AS qy
       |  FROM o, ext
       |), z AS (
       |  SELECT o_orderkey, ck, od,
       |    CAST(NTILE($Files) OVER (ORDER BY ${mortonExpr("qx", "qy", duckDiv)}, o_orderkey) AS BIGINT) AS file_id
       |  FROM q
       |)
       |SELECT file_id, COUNT(*) AS n_rows,
       |  MIN(ck) AS ck_lo, MAX(ck) AS ck_hi,
       |  MIN(od) AS od_lo, MAX(od) AS od_hi
       |FROM z GROUP BY file_id ORDER BY file_id""".stripMargin
}
