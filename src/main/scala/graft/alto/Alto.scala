package graft.alto

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.parseIntJs

/** The reference's domain pipeline — ALTO OCR XML → simplified JSON +
  * transcript (`script/extract-text-lines-from-alto.js:23946-24072`,
  * `flows/main_flow.py:65-70`) — re-expressed as per-row columnar
  * expressions.
  *
  * Architecture notes (100 TB posture):
  *  - The whole document transform is *per-row* higher-order-function
  *    work (`transform`/`flatten`/`filter`): no explode, no shuffle, no
  *    state. A corpus of N XML docs maps over partitions untouched.
  *  - The reference forks one Node process + one HTTP fetch + one DOM
  *    parse per document (`flows/main_flow.py:54-58`); here parsing is
  *    Spark's built-in XML reader (StAX, streaming) or `from_xml` over
  *    a string column.
  *  - Tolerance: the reference v2 path CRASHES (TypeError) on a
  *    TextBlock without TextLine or a Page without PrintSpace —
  *    verified empirically against the bundled script. In a distributed
  *    batch a poison document must not kill the job, so missing levels
  *    contribute zero rows here (the reference's "crash the task" maps
  *    to "skip the level"); all other observable behaviors match the
  *    script bit-for-bit (see AltoSpec goldens).
  */
object Alto {

  val NsV2 = "http://www.loc.gov/standards/alto/ns-v2#"
  val NsV3 = "http://www.loc.gov/standards/alto/ns-v3#"

  /** Spark XML options mirroring xml2js 0.2 defaults (attrkey `$` →
    * prefix `_`, charkey `_` → valueTag). */
  val xmlOptions: Map[String, String] = Map(
    "attributePrefix" -> "_",
    "valueTag" -> "_VALUE",
    "ignoreSurroundingSpaces" -> "false",
    "mode" -> "PERMISSIVE")

  /** Distributed XML ingest (S2/S3): one row per `<alto>` document.
    * Strictly better than the reference's per-URL fetch+DOM: StAX
    * streaming parse, partitioned by file splits. */
  def readAltoXmlFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml")
      .options(xmlOptions + ("rowTag" -> "alto"))
      .schema(AltoSchema.alto)
      .load(path)
      .withColumn("alto", struct(col("_xmlns"), col("Description"), col("Layout")))
      .select("alto")

  /** Narrow-schema bulk ingest (r20, guide §6): identical scan shape to
    * [[readAltoXmlFiles]], but the schema handed to the StAX parser is
    * [[AltoSchema.altoBulk]] — only the fields the bulk token-accounting
    * query reads. The parser skips converting the other three token
    * attributes and the OCRProcessing subtree entirely (ReadSchema
    * narrowing for a custom source). */
  def readAltoXmlFilesBulk(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml")
      .options(xmlOptions + ("rowTag" -> "alto"))
      .schema(AltoSchema.altoBulk)
      .load(path)
      .withColumn("alto", struct(col("_xmlns"), col("Description"), col("Layout")))
      .select("alto")

  /** Bulk twin of [[simplify]] over the narrow schema: the same
    * 6-level flatten, v2 truthy-CONTENT filter, and namespace dispatch,
    * with tokens carrying only (text, x) and the description reduced to
    * (fileName, width) — exactly the fields q_alto_bulk consumes. Field
    * semantics (head-of-array chains, JS parseInt, v3's undefined
    * fileName) mirror the full path, expression for expression. */
  def simplifyBulk(alto: Column): Column = {
    val toks = flatten(transform(ca(alto("Layout")), l =>
      flatten(transform(ca(l("Page")), p =>
        flatten(transform(ca(p("PrintSpace")), ps =>
          flatten(transform(ca(ps("TextBlock")), tb =>
            flatten(transform(ca(tb("TextLine")), tl =>
              transform(ca(tl("String")), s => struct(
                s("_CONTENT").as("text"),
                parseIntJs(s("_HPOS")).as("x")))))))))))))
    val fileName =
      head(head(head(alto("Description"))("sourceImageInformation"))("fileName"))
    val width = head(head(alto("Layout"))("Page"))("_WIDTH")
    val ns = alto("_xmlns")
    val nullToks = lit(null).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.IntegerType)))))
    val nullStr = lit(null).cast("string")
    when(ns === NsV2, struct(
        fileName.as("fileName"), width.as("width"),
        filter(toks, t => t("text").isNotNull && t("text") =!= "").as("text")))
      .when(ns === NsV3, struct(
        nullStr.as("fileName"), width.as("width"), toks.as("text")))
      .otherwise(struct(
        nullStr.as("fileName"), nullStr.as("width"), nullToks.as("text")))
  }

  /** Failure policy for the per-URL fetch path. */
  sealed trait FetchPolicy
  object FetchPolicy {
    /** Reference-faithful (`flows/main_flow.py:59-60`: a non-zero
      * fetch exit raises and fails the flow run): a throwing fetcher
      * fails the Spark task — after task retries, the job. This is the
      * default. */
    case object FailFast extends FetchPolicy
    /** The pipeline's poison-doc stance (same policy simplify() takes
      * for unsupported namespaces): a throwing fetcher yields a null
      * xml for that row, and the `fetch_xml` observe() metric reports
      * (urls, failed_fetches) after any action. */
    case object NullOnError extends FetchPolicy
  }

  /** Per-URL fetch fallback (S2, reference
    * `extract-text-lines-from-alto.js:24061-24063`): a distributed
    * url→document map for archives NOT on a Hadoop-readable store.
    * The fetcher is pluggable — the default is the production HTTP
    * client ([[HttpFetcher]]: timeouts, bounded retry with backoff),
    * swapped for a fixture lookup in tests — and runs once per URL on
    * the executors (the reference forks a whole Node process per URL
    * instead). Prefer readAltoXmlFiles: a scan beats N point fetches
    * whenever the store supports it. */
  def fetchXml(df: DataFrame,
               fetcher: String => String = HttpFetcher.fetcher(),
               urlCol: String = "url", outCol: String = "xml",
               policy: FetchPolicy = FetchPolicy.FailFast): DataFrame =
    policy match {
      case FetchPolicy.FailFast =>
        df.withColumn(outCol, udf(fetcher).apply(col(urlCol)))
      case FetchPolicy.NullOnError =>
        val safe = (u: String) =>
          try Option(fetcher(u))
          catch { case scala.util.control.NonFatal(_) => None }
        df.withColumn(outCol, udf(safe).apply(col(urlCol)))
          .observe("fetch_xml",
            count(lit(1)).as("urls"),
            sum(when(col(outCol).isNull, 1).otherwise(0)).as("failed_fetches"))
    }

  /** Parse an XML string column into the ALTO struct (`from_xml`). */
  def parseXml(xmlCol: Column): Column =
    from_xml(xmlCol, AltoSchema.alto,
      scala.jdk.CollectionConverters.MapHasAsJava(xmlOptions).asJava)

  private def ca(c: Column): Column = coalesce(c, array())
  private def head(c: Column): Column = element_at(c, 1)

  /** One `<String>` token → {text, x, y, width, height} with JS
    * parseInt semantics (`:23971-23977`). */
  private def token(s: Column): Column = struct(
    s("_CONTENT").as("text"),
    parseIntJs(s("_HPOS")).as("x"),
    parseIntJs(s("_VPOS")).as("y"),
    parseIntJs(s("_WIDTH")).as("width"),
    parseIntJs(s("_HEIGHT")).as("height"))

  /** The 6-level Layout→Page→PrintSpace→TextBlock→TextLine→String
    * flatten (G1, `:23962-23983` v2 / `:24006-24024` v3), in document
    * order, as a single per-row expression. */
  private def flatTokens(alto: Column): Column =
    flatten(transform(ca(alto("Layout")), l =>
      flatten(transform(ca(l("Page")), p =>
        flatten(transform(ca(p("PrintSpace")), ps =>
          flatten(transform(ca(ps("TextBlock")), tb =>
            flatten(transform(ca(tb("TextLine")), tl =>
              transform(ca(tl("String")), s => token(s))))))))))))

  /** v2 keeps only truthy CONTENT (`if (!altoString.$.CONTENT) return
    * null` + compact, `:23968-23970`); "" and missing are both falsy. */
  private def v2Tokens(alto: Column): Column =
    filter(flatTokens(alto), t => t("text").isNotNull && t("text") =!= "")

  /** v3 keeps every token, empty CONTENT included (`:24011-24018`). */
  private def v3Tokens(alto: Column): Column = flatTokens(alto)

  /** description.* scalars via null-safe head-of-array chains — the
    * Spark analog of the `?.[0]?.` optional chaining (`:23986-23998`). */
  private def descriptionStruct(alto: Column, fileNameSupported: Boolean): Column = {
    val step = head(head(head(alto("Description"))("OCRProcessing"))("ocrProcessingStep"))
    val sw = head(step("processingSoftware"))
    val page0 = head(head(alto("Layout"))("Page"))
    val fileName =
      if (fileNameSupported)
        head(head(head(alto("Description"))("sourceImageInformation"))("fileName"))
      else lit(null).cast("string") // v3 hardcodes undefined (`:24027`)
    struct(
      fileName.as("fileName"),
      head(step("processingDateTime")).as("processingDateTime"),
      head(step("processingStepSettings")).as("processingStepSettings"),
      head(sw("softwareCreator")).as("softwareCreator"),
      head(sw("softwareName")).as("softwareName"),
      head(sw("softwareVersion")).as("softwareVersion"),
      page0("_WIDTH").as("width"),   // kept as STRING, never parsed (`:23997`)
      page0("_HEIGHT").as("height"))
  }

  private def nullDescription: Column = {
    val n = lit(null).cast("string")
    struct(n.as("fileName"), n.as("processingDateTime"),
      n.as("processingStepSettings"), n.as("softwareCreator"),
      n.as("softwareName"), n.as("softwareVersion"),
      n.as("width"), n.as("height"))
  }

  /** Namespace dispatch (F7, `:23957-24058`) → simplified document
    * struct. Unsupported versions yield the all-null record, not an
    * error (`:24044-24058`). */
  def simplify(alto: Column): Column = {
    val ns = alto("_xmlns")
    when(ns === NsV2,
      struct(descriptionStruct(alto, fileNameSupported = true).as("description"),
             v2Tokens(alto).as("text")))
    .when(ns === NsV3,
      struct(descriptionStruct(alto, fileNameSupported = false).as("description"),
             v3Tokens(alto).as("text")))
    .otherwise(
      struct(nullDescription.as("description"),
             lit(null).cast(org.apache.spark.sql.types.ArrayType(AltoSchema.textLineOut)).as("text")))
  }

  /** Transcript = space-join of token texts in document order
    * (A1/F2, `flows/main_flow.py:70`). `array_join` skips null texts
    * (the reference raises KeyError there — same "poison doc" stance
    * as the flatten). No shuffle: array order IS document order. */
  def transcript(simplified: Column): Column =
    array_join(simplified("text")("text"), " ")

  /** Simplified-JSON serialization (F5), compact form;
    * `ignoreNullFields` matches JSON.stringify dropping undefined
    * keys. */
  def toSimplifiedJson(simplified: Column): Column =
    to_json(simplified, Map("ignoreNullFields" -> "true"))

  /** Byte-parity form of F5: the reference emits
    * `JSON.stringify(simplifiedAlto, null, 2)`
    * (`extract-text-lines-from-alto.js:24071`) — 2-space pretty JSON.
    * json_pretty re-lays the compact form in that exact byte format,
    * so S5 objects written from this column equal the reference's S3
    * objects byte-for-byte (AltoSpec pins a golden). */
  def toSimplifiedJsonPretty(simplified: Column): Column =
    graft.functions.JsonPrettyColumn(toSimplifiedJson(simplified))

  /** Full document pipeline over (id, url, xml) rows: the engine-side
    * equivalent of the reference's per-row task chain
    * (`flows/main_flow.py:136-153`), minus the external sinks.
    *
    * The reference logs every unsupported-namespace document to stderr
    * before emitting the all-null record
    * (`extract-text-lines-from-alto.js:24045`); per-row stderr is not
    * an executor-side concept, so the engine-idiomatic equivalent is an
    * `observe()` metric: after any action, `alto_pipeline` reports
    * (docs, skipped_unsupported_docs) via
    * `df.queryExecution.observedMetrics` / a QueryExecutionListener —
    * zero overhead beyond one counter per partition, no UDFs. */
  def pipeline(df: DataFrame, idCol: String = "representation_id",
               urlCol: String = "url", xmlCol: String = "xml"): DataFrame = {
    import graft.functions.GraftFunctions._
    val ns = col("alto")("_xmlns")
    df.withColumn("alto", parseXml(col(xmlCol)))
      .observe("alto_pipeline",
        count(lit(1)).as("docs"),
        sum(when(ns.isNull || (ns =!= NsV2 && ns =!= NsV3), 1).otherwise(0))
          .as("skipped_unsupported_docs"))
      .withColumn("simplified", simplify(col("alto")))
      .withColumn("json", toSimplifiedJson(col("simplified")))
      .withColumn("json_pretty", toSimplifiedJsonPretty(col("simplified")))
      .withColumn("transcript", transcript(col("simplified")))
      .withColumn("s3_key", s3Key(col(urlCol)))
      .select(col(idCol), col(urlCol), col("simplified"),
        col("json"), col("json_pretty"), col("transcript"), col("s3_key"))
  }

  /** Exploded token-level relational view (one row per kept `<String>`)
    * for token-level analytics; `posexplode` keeps document order
    * explicit so downstream aggregation can stay deterministic. */
  def tokens(df: DataFrame, docIdCol: String): DataFrame =
    tokenView(df, docIdCol, outer = false)

  /** Outer variant: a document with no tokens (empty v2 filter result,
    * unsupported namespace → null array) keeps one all-null row —
    * `posexplode_outer` vs `posexplode`, the generator-side encoding
    * of "don't silently lose empty documents" (SURVEY.md §2.8 P6). */
  def tokensOuter(df: DataFrame, docIdCol: String): DataFrame =
    tokenView(df, docIdCol, outer = true)

  private def tokenView(df: DataFrame, docIdCol: String, outer: Boolean): DataFrame = {
    val gen =
      if (outer) posexplode_outer(col("simplified")("text"))
      else posexplode(col("simplified")("text"))
    df.select(col(docIdCol), gen.as(Seq("pos", "tok")))
      .select(col(docIdCol), col("pos"),
        col("tok")("text").as("text"),
        col("tok")("x").as("x"), col("tok")("y").as("y"),
        col("tok")("width").as("width"), col("tok")("height").as("height"))
  }
}
