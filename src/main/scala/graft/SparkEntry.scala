package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family lives in its own module exposing
  * `queries: Map[String, (SparkSession, String) => DataFrame]` and
  * `oracles: Map[String, String]` (DuckDB ANSI SQL over the same
  * parquet tables); SparkEntry is the aggregation point the driver
  * reads. Every query is deterministic (total ORDER BY) and aliases
  * computed columns identically in Spark and SQL.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    graft.operators.CatalogModule,
    graft.alto.AltoModule,
    graft.operators.RelationalModule,
    graft.operators.TextAnalysisModule,
    graft.operators.DedupModule,
    graft.operators.SimilarityModule,
    graft.operators.PqModule,
    graft.operators.EventsModule,
    graft.operators.LinkageModule,
    graft.operators.GraphModule,
    graft.operators.MultimodalModule,
    graft.operators.CorpusModule,
    graft.operators.CurationModule,
    graft.operators.PipelineModule
  )

  /** Flagship query; driver smoke-checks rows>0. The data directory
    * defaults to the driver's sf0.001 layout but follows
    * SPARK_GRAFT_SF_DIR like Bench does. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Catalog.worklist(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap

  /** oracleSql plus the oracles that can only be written with the data
    * in hand — e.g. q_knn_ivf_fit's quantizer is a k-means model FITTED
    * on the corpus, so its oracle inlines the fitted centroids as
    * literals at dump time (Verify). The static map stays the no-session
    * contract; the driver's DuckDB compare reads the resolved dump. */
  def oracleSqlResolved(spark: SparkSession, dir: String): Map[String, String] =
    oracleSql ++ modules.flatMap(_.dynamicOracles(spark, dir)).toMap
}

/** One operator family's contribution to the driver contract. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
  /** Oracles whose SQL depends on session-fitted model artifacts
    * (inlined as literals once the data is readable). Most families
    * have none. */
  def dynamicOracles(spark: SparkSession, dir: String): Map[String, String] = Map.empty
}
