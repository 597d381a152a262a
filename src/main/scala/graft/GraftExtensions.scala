package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDotProduct, ImageDims, JaroWinklerSimilarity, JsonPretty, Mp4Info, ParseIntJs, WavInfo}

/** SparkSessionExtensions entry point: wires graft's custom Catalyst
  * pieces into a session so the SQL surface sees them
  * (`spark.sql("SELECT parseint_js(col) ...")`). Activate with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions      // config, or
  * SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * `GraftExtensions.register(spark)` does the same for an already-
  * running session (tests, notebooks). Only functions are injected —
  * the engine needs no custom planner rules (SURVEY.md §4): every
  * rewrite it relies on is stock Catalyst.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("parseint_js"),
      new ExpressionInfo(classOf[ParseIntJs].getName, "parseint_js"),
      (children: Seq[Expression]) => ParseIntJs(children.head)),
    (new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (children: Seq[Expression]) => ArrayDotProduct(children(0), children(1))),
    (new FunctionIdentifier("json_pretty"),
      new ExpressionInfo(classOf[JsonPretty].getName, "json_pretty"),
      (children: Seq[Expression]) => JsonPretty(children.head)),
    (new FunctionIdentifier("image_dims"),
      new ExpressionInfo(classOf[ImageDims].getName, "image_dims"),
      (children: Seq[Expression]) => ImageDims(children.head)),
    (new FunctionIdentifier("wav_info"),
      new ExpressionInfo(classOf[WavInfo].getName, "wav_info"),
      (children: Seq[Expression]) => WavInfo(children.head)),
    (new FunctionIdentifier("mp4_info"),
      new ExpressionInfo(classOf[Mp4Info].getName, "mp4_info"),
      (children: Seq[Expression]) => Mp4Info(children.head)),
    (new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "jaro_winkler"),
      (children: Seq[Expression]) => JaroWinklerSimilarity(children(0), children(1))))

  /** Register into a live session (the extensions path only applies at
    * session construction). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
