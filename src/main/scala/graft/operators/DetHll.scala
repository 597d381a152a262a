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

/** Deterministic Count-Min sketch (Cormode & Muthukrishnan 2005) as
  * pure relational algebra — the frequency-estimation sibling of
  * [[DetHll]]: d = 4 hash rows × w = 1024 counters, built with the
  * same engine-portable 62-bit integer hash so BOTH gate engines
  * compute identical counter tables and identical estimates, making a
  * frequency sketch hash-checkable end to end.
  *
  * The registered query estimates per-customer order counts for the
  * top-10 heaviest customers and reports them NEXT TO the exact
  * counts, with the overestimate column exposing the sketch's
  * one-sided error (CM never underestimates: est = min over rows of a
  * counter that includes every true occurrence).
  *
  * Scale posture (100 TB): the sketch build is one groupBy over
  * (row, bucket) — map-side combined to ≤ d·w = 4096 accumulator rows
  * per partition regardless of input size, and the counter table is
  * mergeable additive state (SUM — associative/commutative), i.e. the
  * standard distributed heavy-hitter shape. The probe side joins a
  * 40-row broadcast (10 keys × 4 rows) against the 4096-row counter
  * table. The exact twin here is itself a full groupBy; at production
  * scale the sketch REPLACES that full aggregation — the exact side
  * exists for the gate's comparison.
  */
object DetCms {
  val D = 4
  val W = 1024

  /** Mersenne prime 2^31 − 1: the modulus of the pairwise-independent
    * row-hash family. */
  private val P = 2147483647L
  private val As = Seq(1000003L, 2000029L, 3000073L, 4000037L)
  private val Bs = Seq(17L, 8191L, 524287L, 2654435L)

  /** Row hashes derive from ONE avalanche of the key — hash_i(k) =
    * ((a_i·(h62(k) mod p) + b_i) mod p) mod w, the classic
    * pairwise-independent linear family. One shared base hash (not
    * four independent trees) lets whole-stage codegen's common-
    * subexpression elimination evaluate the avalanche once per row:
    * the four-independent-h62 formulation measured 4.0 s at sf0.1,
    * this one ~4× less work per row. Every product is ≤ 4·10^6 · 2^31
    * < 2^63, so both engines' multiplies agree. */
  private def bucketExpr(key: String, i: Int, o: DetHll.Ops): String =
    s"(((${As(i)} * (${DetHll.h62(key, o)} % $P) + ${Bs(i)}) % $P) % $W)"

  /** Bucket from an already-materialized base hash `hm` ∈ [0, p): the
    * Spark plan stages hm in a projection BELOW the inline generator —
    * the generator's four struct expressions each reference the bound
    * attribute instead of re-running the avalanche (generators sit
    * outside whole-stage CSE; the staged form measured 2.5 s → ~0.7 s
    * at sf0.1). */
  private def bucketFromHm(i: Int): String =
    s"(((${As(i)} * hm + ${Bs(i)}) % $P) % $W)"

  /** Top-10 heavy hitters with exact vs CM-estimated counts. */
  def cmsHeavyHitters(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val o = DetHll.sparkOps
    val orders = Tables.orders(spark, dir)
    val hmExpr = s"(${DetHll.h62("CAST(o_custkey AS BIGINT)", o)} % $P)"
    val inlineBuckets = s"inline(array(${(0 until D).map(i =>
      s"struct($i AS row_idx, ${bucketFromHm(i)} AS bucket)").mkString(", ")}))"
    val counters = orders
      .selectExpr("o_custkey", s"$hmExpr AS hm")
      .selectExpr(inlineBuckets)
      .groupBy("row_idx", "bucket")
      .agg(count(lit(1)).as("c"))
    val exact = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("o_custkey").asc)
      .limit(k)
    val probes = exact
      .selectExpr("o_custkey", "n_exact", s"$hmExpr AS hm")
      .selectExpr("o_custkey", "n_exact", inlineBuckets)
    broadcast(probes).join(counters, Seq("row_idx", "bucket"))
      .groupBy("o_custkey", "n_exact")
      .agg(min(col("c")).as("n_est"))
      .select(col("o_custkey"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overestimate"))
      .orderBy(col("n_exact").desc, col("o_custkey").asc)
  }

  /** DuckDB oracle — same pipeline, [[DetHll.duckOps]] spellings. */
  def oracle: String = {
    val o = DetHll.duckOps
    def rowsFor(src: String, keyCol: String): String =
      (0 until D).map(i =>
        s"SELECT $keyCol, $i AS row_idx, ${bucketExpr(s"CAST($keyCol AS BIGINT)", i, o)} AS bucket FROM $src")
        .mkString(" UNION ALL ")
    s"""WITH hashed AS (${rowsFor("orders", "o_custkey")}),
       |counters AS (SELECT row_idx, bucket, COUNT(*) AS c
       |             FROM hashed GROUP BY row_idx, bucket),
       |exact AS (SELECT o_custkey, COUNT(*) AS n_exact FROM orders
       |          GROUP BY o_custkey ORDER BY n_exact DESC, o_custkey ASC LIMIT 10),
       |ph AS (${(0 until D).map(i =>
      s"SELECT o_custkey, n_exact, $i AS row_idx, ${bucketExpr("CAST(o_custkey AS BIGINT)", i, o)} AS bucket FROM exact")
      .mkString(" UNION ALL ")}),
       |est AS (SELECT o_custkey, n_exact, MIN(c) AS n_est
       |        FROM ph JOIN counters USING (row_idx, bucket)
       |        GROUP BY o_custkey, n_exact)
       |SELECT o_custkey, n_exact, CAST(n_est AS BIGINT) AS n_est,
       |  CAST(n_est - n_exact AS BIGINT) AS overestimate
       |FROM est ORDER BY n_exact DESC, o_custkey ASC""".stripMargin
  }
}
