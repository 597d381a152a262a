package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the Jaro-Winkler kernel to DuckDB's `jaro_winkler_similarity`
  * (the oracle's independent implementation). Expected values below
  * were read from DuckDB 1.x directly; the full 5,000-case random
  * differential ran at development time and the per-round
  * CORRECTNESS gate re-checks the kernel against DuckDB on the real
  * corpus via q_name_match. */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic pairs match DuckDB to 1e-10") {
    val cases = Seq(
      ("martha", "marhta", 0.9611111111),
      ("dixon", "dicksonx", 0.8133333333),
      ("jellyfish", "smellyfish", 0.8962962963),
      ("duane", "dwayne", 0.8400000000),
      ("abcd", "abce", 0.8833333333),
      ("Customer#000000001", "Customer#000000002", 0.9777777778),
      ("abc", "cba", 0.5555555556),
      ("CRATE", "TRACE", 0.7333333333))
    for ((a, b, exp) <- cases)
      assert(math.abs(jw(a, b) - exp) < 1e-10, s"$a/$b")
  }

  test("empty inputs score 0 — even both-empty (DuckDB convention)") {
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
  }

  test("boost threshold: jaro <= 0.7 gets NO prefix bonus") {
    // common 4-byte prefix, but jaro = 0.6952 — DuckDB leaves it unboosted
    assert(math.abs(jw("abcdx", "abcdefghijklmn") - 0.6952380952) < 1e-10)
    assert(math.abs(jw("abcdefghij", "abcdeXXXXX") - 0.6666666667) < 1e-10)
  }

  test("prefix bonus caps at 4 bytes") {
    val a = "a" * 50 + "b"
    val b = "a" * 50 + "c"
    assert(math.abs(jw(a, b) - 0.9921568627) < 1e-10)
  }

  test("byte semantics, not codepoints: multi-byte UTF-8 scores as bytes") {
    // DuckDB scores these on UTF-8 bytes ('ñ' = 2 bytes)
    assert(math.abs(jw("ñoño", "ñoñó") - 0.9095238095) < 1e-10)
    assert(math.abs(jw("日本語テスト", "日本語テス卜") - 0.9333333333) < 1e-10)
  }

  test("identical strings score 1; disjoint score 0; symmetric") {
    assert(jw("same", "same") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    val (x, y) = ("prefix", "prefixlong")
    assert(jw(x, y) == jw(y, x))
  }

  test("column API runs under codegen and matches the kernel") {
    val df = spark.range(1).select(
      JaroWinklerSimilarity(lit("martha"), lit("marhta")).as("s"),
      JaroWinklerSimilarity(lit(null).cast("string"), lit("x")).as("n"))
    val row = df.collect()(0)
    assert(math.abs(row.getDouble(0) - 0.9611111111) < 1e-10)
    assert(row.isNullAt(1))
  }
}
