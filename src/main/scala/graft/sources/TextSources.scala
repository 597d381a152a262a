package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV / JSON-lines ingest — the text-format side of the source
  * surface (SURVEY.md §2.1; the reference's only text format is the
  * JSON it emits, but a corpus engine ingests both constantly).
  *
  * Scale rules encoded here:
  *  - An EXPLICIT schema is required. Schema inference reads the data
  *    twice (a full extra pass over 100 TB) and silently widens types
  *    on dirty rows; the loaders refuse to infer.
  *  - PERMISSIVE mode with a `_corrupt_record` column: a poison row
  *    lands in the corrupt column instead of killing the job — the
  *    same stance the ALTO pipeline takes on malformed XML.
  *  - Text formats cannot push filters into the scan (row-oriented,
  *    no statistics) — [[toParquet]] is the one-pass conversion to a
  *    columnar landing table, the standard first step before heavy
  *    querying.
  */
object TextSources {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, "string", nullable = true)

  /** CSV with explicit schema; malformed lines survive in
    * `_corrupt_record`. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** JSON-lines with explicit schema; malformed lines survive in
    * `_corrupt_record`. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Split a permissive read into (clean rows without the corrupt
    * column, corrupt raw lines) — the audit fork every ingest job
    * wants. The parse is cached first: Spark refuses corrupt-only
    * projections straight off a raw file scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both
    * forks consume the same parsed batch anyway. At landing scale,
    * write the parsed batch with [[toParquet]] and fork from there
    * instead of holding it in cache. */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.cache()
    val clean = parsed.filter(parsed(CorruptCol).isNull).drop(CorruptCol)
    val bad = parsed.filter(parsed(CorruptCol).isNotNull).select(CorruptCol)
    (clean, bad)
  }

  /** One-pass text→parquet landing conversion: after this, every query
    * gets the vectorized columnar reader, pushdown, and row-group
    * pruning that the text formats cannot provide. */
  def toParquet(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").parquet(outDir)

  /** ORC landing twin of [[toParquet]] — same columnar guarantees
    * (vectorized reader, predicate pushdown into stripe/row-group
    * selection, column pruning) for shops whose lake standard is ORC.
    * Both directions use Spark's built-in datasource; no format
    * branching anywhere else in the engine, because every operator
    * consumes a DataFrame regardless of where the scan came from. */
  def toOrc(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").orc(outDir)

  /** ORC scan (explicit schema optional — ORC files carry one). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
