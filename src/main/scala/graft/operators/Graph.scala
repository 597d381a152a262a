package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Iterative graph analytics over the order graph: customers and
  * suppliers as nodes, (customer)–(supplier) edges weighted by how
  * many lineitems connect them (orders ⋈ lineitem, aggregated). The
  * canonical "importance over a transaction graph" workload — and the
  * engine's demonstration that ITERATIVE algorithms decompose into the
  * same deterministic relational algebra the rest of the library uses
  * (Pregel-style message passing = join + aggregate per superstep).
  *
  * PageRank (damping 0.85, [[PrIters]] synchronous iterations,
  * uniform 1/N init, weighted out-edges):
  *   r'(v) = 0.15/N + 0.85 · Σ_{u→v} r(u) · w(u,v)/outw(u)
  *
  * Determinism discipline (the perplexityScore pattern): each edge
  * contribution r(u)·frac(u,v) is a product of identical doubles in
  * both engines, ROUNDED to 9 dp, summed as DECIMAL(29,9) — so the
  * per-node reduction is order-proof and the final ranks hash-match
  * against DuckDB replaying the same 10 unrolled supersteps. No libm
  * is involved anywhere.
  *
  * Scale posture: one superstep = one shuffle (contributions hash-
  * partitioned on dst) + a broadcast-sized rank table join. Edges are
  * built ONCE, checkpointed, and re-joined per iteration — never
  * re-derived; the rank table (|nodes| rows — millions at 100 TB,
  * still tiny next to the edge table) co-partitions with the edge
  * src. Per-iteration checkpoints truncate the lineage so superstep
  * k's plan doesn't embed supersteps 1..k−1 (the classic iterative-
  * DataFrame plan explosion). */
object Graph {

  private[operators] val PrIters = 10
  private[operators] val Damping = 0.85

  /** 1 − damping as a PARSED literal, not computed: Scala's
    * `1 - 0.85` evaluates to 0.15000000000000002 while both engines
    * parse "0.15" to the (different) nearest double — the teleport
    * term must come from the same parse on both sides. */
  private[operators] val Teleport = 0.15

  /** (src, dst, frac) directed both ways + node table. */
  private def edgeFracs(spark: SparkSession, dir: String): DataFrame = {
    val eb = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(concat(lit("c"), col("o_custkey")).as("a"),
        concat(lit("s"), col("l_suppkey")).as("b"))
      .agg(count(lit(1)).as("w"))
    val e = eb.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(eb.select(col("b").as("src"), col("a").as("dst"), col("w")))
    val ow = e.groupBy("src").agg(sum(col("w")).as("ow"))
    e.join(ow, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("ow").cast("double")).as("frac"))
  }

  /** Weighted PageRank, top-20 nodes. */
  def pagerank(spark: SparkSession, dir: String): DataFrame =
    pagerankFull(spark, dir)
      .select(col("node"), round(col("r"), 6).as("rank"), col("r"))
      .orderBy(col("r").desc, col("node").asc)
      .limit(20)
      .drop("r")

  /** Full rank table (node, r) after [[PrIters]] supersteps. */
  private[operators] def pagerankFull(spark: SparkSession, dir: String): DataFrame = {
    val en = Dedup.checkpointSer(edgeFracs(spark, dir))
    val nodes = Dedup.checkpointSer(en.select(col("src").as("node")).distinct())
    val cnt = nodes.agg(count(lit(1)).as("n"))
    var rank = nodes.crossJoin(broadcast(cnt))
      .select(col("node"), (lit(1.0) / col("n")).as("r"))
    for (_ <- 1 to PrIters) {
      val contrib = en.join(rank, col("node") === col("src"))
        .select(col("dst"),
          round(col("r") * col("frac"), 9).cast("decimal(29,9)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
      rank = Dedup.checkpointSer(
        nodes.crossJoin(broadcast(cnt))
          .join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(Teleport) / col("n") + lit(Damping) *
              coalesce(col("sc"), lit(0).cast("decimal(38,9)")).cast("double"))
              .as("r")))
    }
    rank
  }

  /** Degree distribution per side — the pre-flight audit before any
    * graph job (a power-law tail predicts the skew the superstep
    * shuffle must absorb). One corpus-sized aggregation, then a
    * bounded histogram. */
  def degreeHistogram(spark: SparkSession, dir: String): DataFrame =
    edgeFracs(spark, dir)
      .groupBy(col("src").substr(1, 1).as("side"), col("src"))
      .agg(count(lit(1)).as("degree"))
      .groupBy("side", "degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy("side", "degree")
}

/** Driver-contract registration for the graph set. */
object GraphModule extends QueryModule {

  def queries = Map(
    "q_graph_pagerank" -> ((s: SparkSession, d: String) => Graph.pagerank(s, d)),
    "q_graph_degree" -> ((s: SparkSession, d: String) => Graph.degreeHistogram(s, d)))

  /** The shared edge/node CTE head. */
  private val GraphCte: String =
    """eb AS (SELECT 'c' || o_custkey AS a, 's' || l_suppkey AS b,
      |    CAST(COUNT(*) AS BIGINT) AS w
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2),
      |e AS (SELECT a AS src, b AS dst, w FROM eb
      |      UNION ALL SELECT b AS src, a AS dst, w FROM eb),
      |ow AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src),
      |en AS (SELECT e.src, e.dst,
      |    CAST(e.w AS DOUBLE) / CAST(ow.ow AS DOUBLE) AS frac
      |  FROM e JOIN ow ON ow.src = e.src),
      |n AS (SELECT DISTINCT src AS node FROM e),
      |cnt AS (SELECT COUNT(*) AS n FROM n)""".stripMargin

  /** Ten unrolled PageRank supersteps — same arithmetic, same 9-dp
    * round + DECIMAL(29,9) reduction as the Spark side. */
  private def pagerankSql: String = {
    val steps = (1 to Graph.PrIters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (SELECT en.dst AS node,
         |    CAST(round($prev.r * en.frac, 9) AS DECIMAL(29,9)) AS c
         |  FROM en JOIN $prev ON $prev.node = en.src),
         |s$i AS (SELECT node, SUM(c) AS sc FROM c$i GROUP BY node),
         |r$i AS (SELECT n.node,
         |    CAST(0.15 AS DOUBLE) / cnt.n + CAST(0.85 AS DOUBLE) *
         |      CAST(coalesce(s$i.sc, 0) AS DOUBLE) AS r
         |  FROM n CROSS JOIN cnt LEFT JOIN s$i ON s$i.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $GraphCte,
       |r0 AS (SELECT node, CAST(1 AS DOUBLE) / cnt.n AS r FROM n CROSS JOIN cnt),
       |$steps
       |SELECT node, round(r, 6) AS rank FROM r${Graph.PrIters}
       |ORDER BY r DESC, node ASC LIMIT 20""".stripMargin
  }

  def oracles = Map(
    "q_graph_pagerank" -> pagerankSql,
    "q_graph_degree" ->
      s"""WITH $GraphCte,
         |d AS (SELECT substring(src, 1, 1) AS side, src,
         |    CAST(COUNT(*) AS BIGINT) AS degree
         |  FROM e GROUP BY 1, 2)
         |SELECT side, degree, COUNT(*) AS n_nodes
         |FROM d GROUP BY side, degree ORDER BY side, degree""".stripMargin)
}
