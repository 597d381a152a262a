package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Text-format ingest semantics: explicit schema, poison rows survive
  * in the corrupt column, and the parquet landing conversion restores
  * pushdown. */
class TextSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("name", StringType)

  private def writeLines(lines: Seq[String], suffix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-txt").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"data$suffix"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("csv: explicit schema, malformed row lands in _corrupt_record, clean rows typed") {
    val dir = writeLines(Seq("id,name", "1,alpha", "not-a-long,beta", "3,gamma"), ".csv")
    val df = TextSources.csv(spark, dir, schema)
    val (clean, bad) = TextSources.splitCorrupt(df)
    assert(clean.as[(Long, String)].collect().toSet == Set((1L, "alpha"), (3L, "gamma")))
    assert(bad.as[String].collect().toSeq == Seq("not-a-long,beta"))
  }

  test("json lines: explicit schema, poison line preserved verbatim") {
    val dir = writeLines(Seq(
      """{"id": 1, "name": "alpha"}""",
      """{"id": oops not json""",
      """{"id": 2, "name": "beta"}"""), ".json")
    val df = TextSources.jsonLines(spark, dir, schema)
    val (clean, bad) = TextSources.splitCorrupt(df)
    assert(clean.as[(Long, String)].collect().toSet == Set((1L, "alpha"), (2L, "beta")))
    assert(bad.as[String].collect().toSeq == Seq("""{"id": oops not json"""))
  }

  test("parquet landing restores filter pushdown that csv cannot provide") {
    val dir = writeLines(Seq("id,name", "1,alpha", "2,beta"), ".csv")
    val (clean, _) = TextSources.splitCorrupt(TextSources.csv(spark, dir, schema))
    val out = java.nio.file.Files.createTempDirectory("graft-land").toString + "/t"
    TextSources.toParquet(clean, out)
    val q = spark.read.parquet(out).filter($"id" === 2L)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,2)]"), scan)
    assert(q.count() == 1)
  }

  test("orc landing round-trips and pushes filters like parquet") {
    val dir = writeLines(Seq("id,name", "1,alpha", "2,beta"), ".csv")
    val (clean, _) = TextSources.splitCorrupt(TextSources.csv(spark, dir, schema))
    val out = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/t"
    TextSources.toOrc(clean, out)
    val back = TextSources.orc(spark, out)
    assert(back.as[(Long, String)].collect().toSet == Set((1L, "alpha"), (2L, "beta")))
    val q = back.filter($"id" === 2L)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,2)]"), scan)
    assert(q.count() == 1)
  }
}
