package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The reference's catalog work-list query (`flows/main_flow.py:22-30`)
  * re-expressed on the testdata star schema per FIXTURES.md §B:
  *
  * {{{
  * SELECT representation_id, premis_stored_at
  * FROM graph.file f JOIN graph.includes i ON i.file_id = f.id
  * WHERE f.ebucore_has_mime_type = 'application/xml'
  *   AND schema_name LIKE '%alto%' [AND f.updated_at >= :since]
  * }}}
  *
  * maps to orders ⋈ customer with an equality predicate
  * (o_orderstatus, for ebucore_has_mime_type =), a contains/LIKE
  * predicate (c_mktsegment, for schema_name LIKE), the incremental
  * range predicate (o_orderdate >= since, for updated_at >= since), and
  * a 2-column projection. Operators covered: S4, J1, P1-P5, S9.
  *
  * Scale posture: both filters and the 2-column projection push into
  * the parquet scan (PushedFilters/ReadSchema); the join key is a PK-FK
  * equi-join so Catalyst picks broadcast-hash when customer is small
  * and sort-merge + AQE otherwise. No driver-side materialization — the
  * reference's `fetchall()` work-list (main_flow.py:44) stays
  * distributed here.
  */
object Catalog {

  /** Full-sync work-list (reference `full_sync=True` path). */
  def worklist(spark: SparkSession, dir: String): DataFrame =
    worklistSince(spark, dir, None)

  /** Incremental work-list: `since` is the persisted watermark date
    * (reference `flows/main_flow.py:29-30,129-134`). Parameterized, not
    * string-interpolated (the reference interpolates unquoted — an
    * injection hazard we do not reproduce).
    */
  def worklistSince(spark: SparkSession, dir: String, since: Option[String]): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val filtered = since.foldLeft(
      orders.filter(col("o_orderstatus") === lit("O"))
    )((df, s) => df.filter(col("o_orderdate") >= to_timestamp(lit(s))))
    filtered
      .join(customer, filtered("o_custkey") === customer("c_custkey"), "inner")
      .filter(col("c_mktsegment").like("%BUILD%"))
      .select(col("o_orderkey").as("representation_id"),
              col("c_name").as("stored_at"))
      .orderBy("representation_id", "stored_at")
  }
}

/** Driver-contract registration for the catalog work-list slice. */
object CatalogModule extends graft.QueryModule {
  def queries = Map(
    "q_catalog_worklist" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
      Catalog.worklist(s, d)),
    "q_catalog_worklist_since" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
      Catalog.worklistSince(s, d, Some("1999-01-01")))
  )
  def oracles = Map(
    "q_catalog_worklist" ->
      """SELECT o_orderkey AS representation_id, c_name AS stored_at
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O' AND c_mktsegment LIKE '%BUILD%'
        |ORDER BY representation_id, stored_at""".stripMargin,
    "q_catalog_worklist_since" ->
      """SELECT o_orderkey AS representation_id, c_name AS stored_at
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O' AND c_mktsegment LIKE '%BUILD%'
        |  AND o_orderdate >= TIMESTAMP '1999-01-01'
        |ORDER BY representation_id, stored_at""".stripMargin
  )
}
