package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic HyperLogLog (Flajolet et al. 2007) as pure relational
  * algebra — the distinct-count sketch rebuilt so that BOTH engines of
  * the correctness gate (Spark and the DuckDB oracle) compute the SAME
  * registers bit-for-bit, closing the one gap `q_hll_priority` has to
  * declare rows-only (Spark's internal HLL++ sketch hashes with xxhash64,
  * which DuckDB cannot replay).
  *
  * Everything up to the final estimate stays in EXACT integer
  * arithmetic, chosen so neither engine can diverge:
  *
  *  - 62-bit hash from two 32-bit mix chains ((x>>16 ^ x) * 0x45d9f3b
  *    twice, then fold — the well-known lowbias32 avalanche): every
  *    intermediate product is bounded by 2^33 * 2^27 = 2^60 < 2^63, so
  *    Spark's wrapping multiply and DuckDB's overflow-checked multiply
  *    agree on every value. No xxhash/murmur — those are engine-internal.
  *  - register index = top 12 bits (m = 4096), rank = leading-zero count
  *    of the remaining 50 bits + 1, computed by an explicit 50-branch
  *    integer-threshold CASE (no floating log2 whose rounding could
  *    differ at exact powers of two).
  *  - the register sum Σ 2^(-rank) is scaled to the integer domain as
  *    Σ 2^(51-rank), accumulated in DECIMAL(20,0): exact under any
  *    partial-aggregation order, immune to float non-associativity.
  *  - only the final estimate leaves integers: one decimal→double cast,
  *    one left-associative double expression with identical text in both
  *    engines, rounded to a whole count.
  *
  * Scale posture (100 TB): this is the production shape of distributed
  * distinct-count — groupBy(group, bucket).max(rank) partial-aggregates
  * map-side to ≤ m rows per group per partition, the register table is
  * mergeable state (max is associative/commutative), and the estimate is
  * a per-group O(m) fold. No per-row state crosses the shuffle beyond
  * the register id; cardinality of the shuffle is bounded by
  * groups × 4096 regardless of input row count.
  *
  * Reference anchor: the reference has no sketch aggregate at all (its
  * only aggregate is the transcript concat, flows/main_flow.py:70); this
  * extends SURVEY §2.4's approx family. Estimate error is the standard
  * 1.04/sqrt(4096) ≈ 1.6% (spec-pinned at 5% against countDistinct).
  */
object DetHll {

  /** Integer-op spellings that differ between the engines. Everything
    * ELSE in the pipeline is shared text. */
  final case class Ops(xor: (String, String) => String,
                       shr: (String, Int) => String,
                       idiv: (String, Long) => String)

  val sparkOps: Ops = Ops(
    (a, b) => s"($a ^ $b)",
    (a, n) => s"shiftright($a, $n)",
    (a, b) => s"($a div $b)")

  val duckOps: Ops = Ops(
    (a, b) => s"xor($a, $b)",
    (a, n) => s"($a >> $n)",
    (a, b) => s"($a // $b)")

  val P = 12
  val M: Int = 1 << P                 // 4096 registers
  val RemBits = 50                    // 62-bit hash = 12 bucket + 50 rank bits
  val RemMod: Long = 1L << RemBits
  val MaxRank: Int = RemBits + 1      // 51: remainder of all-zero bits
  val TermTop: Long = 1L << MaxRank   // absent-register term 2^51 (rank 0)

  /** lowbias32-style avalanche of a value in [0, 2^33). All constants
    * odd and < 2^27 so products stay < 2^60 (see scaladoc). */
  private def mix32(x: String, o: Ops): String = {
    val c = "73244475" // 0x45d9f3b
    val r1 = s"((${o.xor(o.shr(x, 16), x)} * $c) % 4294967296)"
    val r2 = s"((${o.xor(o.shr(r1, 16), r1)} * $c) % 4294967296)"
    o.xor(o.shr(r2, 16), r2)
  }

  /** Fold an arbitrary non-negative BIGINT key into [0, 2^32): high
    * xor low half. A 32-bit fold caps the effective keyspace — birthday
    * collisions stay under the sketch's own 1.6% error to ~10^8 distinct
    * per group, which covers any per-group cardinality the gate runs;
    * past that, production reaches for the 64-bit HLL++ twin
    * ([[Relational.hllByPriority]]) and this query remains its
    * bit-checkable verifier. */
  private def fold32(key: String, o: Ops): String =
    s"(${o.xor(s"(($key) % 2147483648)", o.idiv(s"($key)", 2147483648L))})"

  /** 62-bit hash: two independently-seeded 32-bit mixes of the folded
    * key, 31 bits each, stacked. */
  def h62(key: String, o: Ops): String = {
    val x = fold32(key, o)
    val ha = mix32(x, o)
    val hb = mix32(s"($x + 1000000007)", o)
    s"((($ha) % 2147483648) * 2147483648 + (($hb) % 2147483648))"
  }

  /** Leading-zero rank of the low [[RemBits]] bits via integer-threshold
    * CASE — identical text in both engines, no floating point. */
  def rankCase(rem: String): String = {
    val whens = (1 to RemBits)
      .map(r => s"WHEN $rem >= ${1L << (RemBits - r)} THEN $r")
      .mkString(" ")
    s"(CASE $whens ELSE $MaxRank END)"
  }

  /** Register term 2^(MaxRank - rank): exact powers of two ≤ 2^50, so
    * the double→bigint cast is exact in both engines. */
  def termExpr(rank: String): String =
    s"CAST(CAST(power(CAST(2 AS DOUBLE), $MaxRank - $rank) AS BIGINT) AS DECIMAL(20,0))"

  /** Final estimate from (nb, s_all): one shared double expression.
    * s_all is the exact integer Σ 2^(51-rank) over all m registers
    * (absent registers contribute 2^51), already cast to DOUBLE.
    * Left-associative, every literal explicitly DOUBLE — both engines
    * evaluate the identical IEEE op sequence. Small-range (linear
    * counting) correction below 2.5·m with empty registers present. */
  def estimateExpr(nb: String, sAll: String): String = {
    val alpha = s"CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST($M AS DOUBLE))"
    val raw = s"$alpha * CAST($M AS DOUBLE) * CAST($M AS DOUBLE) * CAST($TermTop AS DOUBLE) / $sAll"
    s"""CAST(ROUND(CASE WHEN $raw <= CAST(${M * 5 / 2} AS DOUBLE) AND $nb < $M
       |  THEN CAST($M AS DOUBLE) * ln(CAST($M AS DOUBLE) / CAST($M - $nb AS DOUBLE))
       |  ELSE $raw END, 0) AS BIGINT)""".stripMargin
  }

  /** Approx distinct customers per order priority — the deterministic
    * twin of [[Relational.hllByPriority]], hash-checkable end to end. */
  def hllDeterministic(spark: SparkSession, dir: String): DataFrame = {
    val o = sparkOps
    Tables.orders(spark, dir)
      .selectExpr("o_orderpriority",
        s"${h62("CAST(o_custkey AS BIGINT)", o)} AS h62")
      .selectExpr("o_orderpriority",
        s"${o.idiv("h62", RemMod)} AS bucket",
        s"(h62 % $RemMod) AS rem")
      .selectExpr("o_orderpriority", "bucket", s"${rankCase("rem")} AS rnk")
      .groupBy("o_orderpriority", "bucket")
      .agg(max("rnk").as("r"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("nb"),
        sum(expr(termExpr("r"))).as("s_present"))
      .selectExpr("o_orderpriority", "nb",
        s"CAST(s_present + ($M - nb) * $TermTop AS DOUBLE) AS s_all")
      .selectExpr("o_orderpriority",
        s"${estimateExpr("nb", "s_all")} AS hll_customers")
      .orderBy("o_orderpriority")
  }

  /** DuckDB oracle: the same pipeline, CTE-staged, with only the
    * [[duckOps]] spellings differing from the Spark plan's text. */
  def oracle: String = {
    val o = duckOps
    s"""WITH k AS (
       |  SELECT o_orderpriority, ${h62("CAST(o_custkey AS BIGINT)", o)} AS h62 FROM orders
       |), b AS (
       |  SELECT o_orderpriority, ${o.idiv("h62", RemMod)} AS bucket, (h62 % $RemMod) AS rem FROM k
       |), rk AS (
       |  SELECT o_orderpriority, bucket, ${rankCase("rem")} AS rnk FROM b
       |), reg AS (
       |  SELECT o_orderpriority, bucket, MAX(rnk) AS r FROM rk GROUP BY o_orderpriority, bucket
       |), g AS (
       |  SELECT o_orderpriority, COUNT(*) AS nb, SUM(${termExpr("r")}) AS s_present
       |  FROM reg GROUP BY o_orderpriority
       |), e AS (
       |  SELECT o_orderpriority, nb,
       |    CAST(s_present + ($M - nb) * $TermTop AS DOUBLE) AS s_all FROM g
       |)
       |SELECT o_orderpriority, ${estimateExpr("nb", "s_all")} AS hll_customers
       |FROM e ORDER BY o_orderpriority""".stripMargin
  }
}
