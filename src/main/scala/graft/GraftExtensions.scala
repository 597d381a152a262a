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

  /** Arity guard shared by every builder: a wrong-arg-count call
    * (`SELECT jaro_winkler('x')`) must fail ANALYSIS with the expected
    * signature, not reach the builder's positional indexing and throw
    * IndexOutOfBoundsException from deep inside planning. */
  private def arity(name: String, n: Int)(build: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      if (children.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> n.toString,
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      build(children)
    }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("parseint_js"),
      new ExpressionInfo(classOf[ParseIntJs].getName, "parseint_js"),
      arity("parseint_js", 1)(children => ParseIntJs(children.head))),
    (new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      arity("array_dot", 2)(children => ArrayDotProduct(children(0), children(1)))),
    (new FunctionIdentifier("json_pretty"),
      new ExpressionInfo(classOf[JsonPretty].getName, "json_pretty"),
      arity("json_pretty", 1)(children => JsonPretty(children.head))),
    (new FunctionIdentifier("image_dims"),
      new ExpressionInfo(classOf[ImageDims].getName, "image_dims"),
      arity("image_dims", 1)(children => ImageDims(children.head))),
    (new FunctionIdentifier("wav_info"),
      new ExpressionInfo(classOf[WavInfo].getName, "wav_info"),
      arity("wav_info", 1)(children => WavInfo(children.head))),
    (new FunctionIdentifier("mp4_info"),
      new ExpressionInfo(classOf[Mp4Info].getName, "mp4_info"),
      arity("mp4_info", 1)(children => Mp4Info(children.head))),
    (new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "jaro_winkler"),
      arity("jaro_winkler", 2)(children => JaroWinklerSimilarity(children(0), children(1)))))

  /** Register into a live session (the extensions path only applies at
    * session construction). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
