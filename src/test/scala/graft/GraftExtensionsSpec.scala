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

  test("media header kernels are callable from SQL: wav_info / mp4_info / image_dims") {
    GraftExtensions.register(spark)
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(36) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(400)
    Seq((1, wav), (2, "not media".getBytes("UTF-8")))
      .toDF("id", "payload").createOrReplaceTempView("graft_media_probe")
    val out = spark.sql(
      "SELECT id, wav_info(payload) AS w, mp4_info(payload) AS m, image_dims(payload) AS d " +
        "FROM graft_media_probe ORDER BY id").collect()
    assert(out(0).getSeq[Int](1) == Seq(44100, 2, 16, 100))
    assert(out(0).isNullAt(2) && out(0).isNullAt(3))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(3))
  }

  test("a fresh session built withExtensions sees the function") {
    val fresh = spark.newSession()
    // newSession shares the function registry state only if copied; use
    // the runtime path there too — the builder path is exercised by the
    // spark.sql.extensions config in production.
    GraftExtensions.register(fresh)
    assert(fresh.sql("SELECT parseint_js('  +42abc')").head().getInt(0) == 42)
  }

  test("jaro_winkler is callable from SQL with DuckDB-pinned values") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS a," +
        " jaro_winkler('abcdx', 'abcdefghijklmn') AS b," +
        " jaro_winkler('', '') AS c").head()
    assert(math.abs(r.getDouble(0) - 0.9611111111) < 1e-10)
    assert(math.abs(r.getDouble(1) - 0.6952380952) < 1e-10) // no boost below 0.7
    assert(r.getDouble(2) == 0.0) // both-empty scores 0, the DuckDB convention
  }

  test("wrong arity fails analysis with the expected signature, not IndexOutOfBounds") {
    GraftExtensions.register(spark)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT jaro_winkler('x')").collect()
    }
    assert(e1.getMessage.contains("jaro_winkler"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT parseint_js('1', '2')").collect()
    }
    assert(e2.getMessage.contains("parseint_js"))
  }
}
