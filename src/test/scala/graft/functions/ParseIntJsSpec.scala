package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins ParseIntJs against the observable behavior of JS `parseInt`
  * (the reference applies it to ALTO coordinate attributes at
  * `script/extract-text-lines-from-alto.js:23973-23976`). Each case is
  * (input, Node.js parseInt result), NaN → null. */
class ParseIntJsSpec extends SparkSpec {
  import spark.implicits._

  private val cases: Seq[(String, Option[Int])] = Seq(
    "42" -> Some(42),
    "12.7" -> Some(12),
    "12.7px" -> Some(12),
    " 42px" -> Some(42),
    "\t42" -> Some(42),
    "\n 42" -> Some(42),
    "  7" -> Some(7),
    "+5" -> Some(5),
    "-0012" -> Some(-12),
    "0x10" -> Some(16),
    "0X1f" -> Some(31),
    "-0x10" -> Some(-16),
    "0xg" -> None,        // "0x" with no hex digits: JS parseInt("0xg") is NaN
    "0" -> Some(0),
    "-0" -> Some(0),
    "" -> None,
    "   " -> None,
    "px12" -> None,
    "+" -> None,
    "-" -> None,
    "2147483647" -> Some(Int.MaxValue),
    "-2147483648" -> Some(Int.MinValue),
    // documented divergence: JS widens to double beyond int32; we null
    "2147483648" -> None,
    "99999999999999999999" -> None,
    // Unicode parity (each value verified against Node directly):
    // ECMA whitespace includes NBSP/figure-space/BOM/LS (Zs + literals)
    " 42" -> Some(42),
    " 42" -> Some(42),
    "﻿42" -> Some(42),
    " 42" -> Some(42),
    // …but NOT the U+001C-1F separator controls or NEL, which
    // Character.isWhitespace wrongly accepts
    "42" -> None,
    "42" -> None,
    // and JS digits are ASCII-only: Arabic-Indic and fullwidth digits
    // (which Character.digit maps) are NaN in JS
    "٤٢" -> None,
    "４２" -> None)

  test("parseIntJs matches JS parseInt on the pinned case table (codegen path)") {
    val df = cases.map(_._1).toDF("s")
      .select(col("s"), GraftFunctions.parseIntJs(col("s")).as("v"))
    val got = df.collect().map(r => r.getString(0) ->
      (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"parseIntJs('$in')")
    }
  }

  test("null input stays null and the expression is usable in filters") {
    val df = Seq(Some("12"), None).toDF("s")
      .select(GraftFunctions.parseIntJs(col("s")).as("v"))
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq ==
      Seq(Some(12), None))
    assert(df.filter(col("v") > 10).count() == 1)
  }

  test("rolling-hash kernel equals the naive per-window polynomial") {
    def naive(s: String): Option[Long] = {
      if (s.isEmpty) return None
      val k = math.min(8, s.length)
      Some((0 to s.length - k).map { i =>
        s.substring(i, i + k).foldLeft(0L)((h, c) => (h * 131 + c) % 1000000007L)
      }.min)
    }
    val rnd = new scala.util.Random(99)
    val cases = Seq("", "a", "abcdefg", "abcdefgh", "hello world hello world") ++
      (0 until 50).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString)
    cases.foreach { s =>
      val got = Option(RollingMinHash.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))).map(_.longValue())
      assert(got == naive(s), s"rolling hash of '$s'")
    }
  }

  test("interpreted eval agrees with codegen") {
    cases.foreach { case (in, want) =>
      val got = Option(JsParseInt.parse(
        org.apache.spark.unsafe.types.UTF8String.fromString(in))).map(_.intValue())
      assert(got == want, s"JsParseInt.parse('$in')")
    }
  }
}
