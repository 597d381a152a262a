package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.functions.JaroWinklerSimilarity
import graft.sources.Tables

/** Entity resolution / record linkage: match a "dirty" registry of
  * names back to the master table with blocked fuzzy scoring — the
  * structured-data sibling of the document near-dup family (the
  * reference's pipeline keys everything on exact ids; linkage is what
  * a real ingest does when the key is a name typed by a human).
  *
  * The dirty registry is DERIVED deterministically from the master
  * (digit-reversal of the name's numeric tail — a transposition-heavy
  * corruption, the classic typo model), so the oracle can rebuild the
  * identical registry in SQL; the operator itself takes any two
  * DataFrames.
  *
  * Scale posture — the canonical blocked-ER shape:
  *  - NEVER all-pairs: candidates come from an equi-join on the block
  *    key (nation, segment), so the shuffle is hash-partitioned on the
  *    block and pair count is Σ|block|² bounded by the blocking
  *    choice, not |corpus|².
  *  - Scoring is the codegen [[graft.functions.JaroWinklerSimilarity]]
  *    kernel inside the join's whole-stage span — no boxing, no UDF.
  *  - Best-match selection is one ranking window partitioned by the
  *    dirty key, re-using the block partitioning's shuffle output.
  *  - The per-nation report is a bounded hash agg (≤ 25 rows).
  * Ties rank on the 6-dp-ROUNDED score with custkey tie-break, so a
  * sub-ulp libm divergence can't flip match choice between engines
  * (there is none today — both sides run IEEE ops on identical bytes —
  * but the rank key shouldn't depend on that proof). */
object Linkage {

  /** Corruption rule: reverse the digit tail after the 'Customer#0'
    * prefix. Shared text with the oracle's SQL formulation. */
  private def dirtyName(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(substring(c, 1, 10), reverse(c.substr(lit(11), length(c))))

  /** Corruption-invariant blocking key: the SORTED characters of the
    * name's tail. Transposition-class typos (including the probe's
    * digit reversal) permute characters without changing the multiset,
    * so the true match always shares the key — and block sizes stay
    * near-singleton as the corpus grows instead of growing with it.
    * This is the classic sorted-neighborhood/key-normalization move,
    * and it is what keeps blocked ER LINEAR at scale: with only
    * (nation, segment) blocks, 10× rows meant 100× candidate pairs
    * (measured 0.27 s → 14.7 s at the 10× tier); with the invariant
    * key the pair count tracks the corpus. */
  private def tailSig(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws("", array_sort(split(name.substr(lit(11), length(name)), "")))

  /** Blocked fuzzy match of the derived dirty registry against the
    * customer master; per-nation accuracy + mean best-match score. */
  def nameMatch(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val master = cust.select(col("c_custkey").as("m_key"),
      col("c_name").as("m_name"), col("c_nationkey").as("nationkey"),
      col("c_mktsegment").as("segment"), tailSig(col("c_name")).as("sig"))
    val dirty = cust.select(col("c_custkey").as("d_key"),
      dirtyName(col("c_name")).as("d_name"),
      col("c_nationkey").as("nationkey"), col("c_mktsegment").as("segment"))
      .withColumn("sig", tailSig(col("d_name")))
    // argmax as a hash AGGREGATION, not a ranking window: the scored
    // pair stream reduces map-side to one row per dirty key before the
    // shuffle (a window would sort and shuffle every scored pair).
    // max(struct(jw, -m_key)) = highest score, lowest key on ties —
    // identical to the oracle's (jw DESC, m_key ASC) ranking.
    val best = dirty.join(master, Seq("nationkey", "segment", "sig"))
      .withColumn("jw", round(JaroWinklerSimilarity(col("d_name"), col("m_name")), 6))
      .groupBy(col("d_key"), col("nationkey"))
      .agg(max(struct(col("jw"), (-col("m_key")).as("neg_key"))).as("top"))
      .select(col("d_key"), col("nationkey"),
        col("top.jw").as("jw"), (-col("top.neg_key")).as("m_key"))
    best.groupBy("nationkey")
      .agg(count(lit(1)).as("n_records"),
        sum(when(col("m_key") === col("d_key"), 1L).otherwise(0L)).as("n_correct"),
        // exact decimal sum, then ONE double division — avg() would
        // divide in engine-specific decimal/double internals
        round(sum(col("jw").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_score"))
      .orderBy("nationkey")
  }
}

/** Driver-contract registration for the linkage set. */
object LinkageModule extends QueryModule {

  def queries = Map(
    "q_name_match" -> ((s: SparkSession, d: String) => Linkage.nameMatch(s, d)))

  def oracles = Map(
    "q_name_match" ->
      """WITH dirty AS (SELECT c_custkey AS d_key,
        |    substring(c_name, 1, 10) || reverse(substring(c_name, 11)) AS d_name,
        |    c_nationkey AS nationkey, c_mktsegment AS segment,
        |    array_to_string(list_sort(string_split(
        |      reverse(substring(c_name, 11)), '')), '') AS sig
        |  FROM customer),
        |master AS (SELECT c_custkey AS m_key, c_name AS m_name,
        |    c_nationkey AS nationkey, c_mktsegment AS segment,
        |    array_to_string(list_sort(string_split(
        |      substring(c_name, 11), '')), '') AS sig
        |  FROM customer),
        |scored AS (SELECT d_key, m_key, d.nationkey,
        |    round(jaro_winkler_similarity(d_name, m_name), 6) AS jw
        |  FROM dirty d JOIN master m USING (nationkey, segment, sig)),
        |best AS (SELECT *, row_number() OVER (PARTITION BY d_key
        |    ORDER BY jw DESC, m_key ASC) AS rn FROM scored)
        |SELECT nationkey, COUNT(*) AS n_records,
        |  CAST(SUM(CASE WHEN m_key = d_key THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct,
        |  round(CAST(SUM(CAST(jw AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_score
        |FROM best WHERE rn = 1
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin)
}
