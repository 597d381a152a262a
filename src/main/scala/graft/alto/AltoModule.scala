package graft.alto

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule

/** Driver-contract registration for the ALTO domain pipeline.
  *
  * DuckDB cannot parse the XML, so the oracle side is the pinned golden
  * output (VALUES) obtained by running the reference's own Node script
  * on the identical fixtures — the hash compare then checks our whole
  * XML→simplify→transcript path against the reference's observable
  * behavior.
  */
object AltoModule extends QueryModule {

  private val fixtures = Seq(
    "alto_v2_basic.xml", "alto_v2_multilayout.xml", "alto_v2_tolerant.xml",
    "alto_v3_basic.xml", "alto_unsupported.xml")

  private def readResource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/alto/$name")
    // name the missing resource instead of NPEing on the null stream
    // (where the finally's close() would mask even that NPE)
    require(in != null, s"missing classpath resource /alto/$name — fixture not packaged")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** (id, url, xml) rows from the bundled fixtures — stands in for the
    * fetched documents of the reference's work-list loop. */
  def fixtureDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fixtures.zipWithIndex
      .map { case (f, i) => (i.toLong + 1, s"https://archive.test/files/$f", readResource(f)) }
      .toDF("representation_id", "url", "xml")
  }

  private def simplifyQuery(spark: SparkSession, dir: String): DataFrame = {
    val out = Alto.pipeline(fixtureDf(spark))
    out.select(
      col("representation_id"),
      col("simplified")("description")("fileName").as("file_name"),
      col("simplified")("description")("softwareName").as("software_name"),
      col("simplified")("description")("width").as("page_width"),
      coalesce(size(col("simplified")("text")), lit(-1)).as("n_tokens"),
      col("transcript"),
      col("s3_key"))
      .orderBy("representation_id")
  }

  private def tokensQuery(spark: SparkSession, dir: String): DataFrame = {
    val df = fixtureDf(spark)
      .withColumn("simplified", Alto.simplify(Alto.parseXml(col("xml"))))
    Alto.tokens(df, "representation_id")
      .orderBy("representation_id", "pos")
  }

  def queries = Map(
    "q_alto_simplify" -> ((s: SparkSession, d: String) => simplifyQuery(s, d)),
    "q_alto_tokens" -> ((s: SparkSession, d: String) => tokensQuery(s, d)))

  // Golden values pinned by the reference script run (see AltoSpec).
  // size(null array) => -1 marks the unsupported-namespace record.
  def oracles = Map(
    "q_alto_simplify" ->
      """SELECT * FROM (VALUES
        |  (BIGINT '1', 'page_001.tif', 'FineReader', '2400', 2, 'Hello world', 'alto_v2_basic.xml.json'),
        |  (BIGINT '2', NULL, NULL, NULL, 3, 'keep second third', 'alto_v2_multilayout.xml.json'),
        |  (BIGINT '3', NULL, NULL, '10', 1, 'alive', 'alto_v2_tolerant.xml.json'),
        |  (BIGINT '4', NULL, 'Tesseract', '1000', 2, ' v3tok', 'alto_v3_basic.xml.json'),
        |  (BIGINT '5', NULL, NULL, NULL, -1, NULL, 'alto_unsupported.xml.json')
        |) AS t(representation_id, file_name, software_name, page_width, n_tokens, transcript, s3_key)
        |ORDER BY representation_id""".stripMargin,
    "q_alto_tokens" ->
      """SELECT * FROM (VALUES
        |  (BIGINT '1', 0, 'Hello', 100, 200, 50, 20),
        |  (BIGINT '1', 1, 'world', 160, 200, 55, 20),
        |  (BIGINT '2', 0, 'keep', 9, 10, NULL, 12),
        |  (BIGINT '2', 1, 'second', 1, 1, 1, 1),
        |  (BIGINT '2', 2, 'third', 2, 2, 2, 2),
        |  (BIGINT '3', 0, 'alive', 1, 2, 3, 4),
        |  (BIGINT '4', 0, '', 1, 2, 3, 4),
        |  (BIGINT '4', 1, 'v3tok', 10, 20, 30, 40)
        |) AS t(representation_id, pos, text, x, y, width, height)
        |ORDER BY representation_id, pos""".stripMargin)
}
