package graft

/** The injected SQL surface: parseint_js callable from spark.sql. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("parseint_js is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq(("12.7px", 1), ("0x10", 2), ("junk", 3)).toDF("s", "id")
      .createOrReplaceTempView("graft_ext_probe")
    val out = spark.sql(
      "SELECT id, parseint_js(s) AS v FROM graft_ext_probe ORDER BY id")
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    assert(out.toSeq == Seq((1, Some(12)), (2, Some(16)), (3, None)))
  }

  test("json_pretty is callable from SQL and matches JSON.stringify layout") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      """SELECT json_pretty('{"a":1,"b":[],"c":{"d":"x"}}') AS p""")
      .collect().head.getString(0)
    assert(out == "{\n  \"a\": 1,\n  \"b\": [],\n  \"c\": {\n    \"d\": \"x\"\n  }\n}")
  }

  test("array_dot is callable from SQL and widens float arrays to double") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d," +
        " array_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS f")
      .head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 3.0)
  }

  test("a fresh session built withExtensions sees the function") {
    val fresh = spark.newSession()
    // newSession shares the function registry state only if copied; use
    // the runtime path there too — the builder path is exercised by the
    // spark.sql.extensions config in production.
    GraftExtensions.register(fresh)
    assert(fresh.sql("SELECT parseint_js('  +42abc')").head().getInt(0) == 42)
  }
}
