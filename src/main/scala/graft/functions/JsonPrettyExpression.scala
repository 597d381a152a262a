package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `JSON.stringify(obj, null, 2)` parity pretty-printer (reference
  * `script/extract-text-lines-from-alto.js:24071`): re-serializes a
  * compact JSON string in the exact byte layout Node emits, so the
  * one-object-per-row sink (S5) can reproduce the reference's S3
  * objects byte-for-byte:
  *
  *  - 2-space indent per nesting level;
  *  - `"key": value` (one space after the colon, none before);
  *  - every object entry / array element on its own line;
  *  - empty object/array inline as `{}` / `[]`;
  *  - string escaping per JSON.stringify (Jackson's scalar
  *    serialization matches: `"` `\` and control chars escaped,
  *    non-ASCII left literal);
  *  - key order preserved from the input document (Spark's `to_json`
  *    emits struct-field order, which is the order the reference
  *    builds its object literals in).
  *
  * Null/undefined note: JS drops `undefined`-valued keys and keeps
  * `null`s; `to_json(..., ignoreNullFields=true)` drops SQL NULLs —
  * the right mapping, because every absent value in the reference's
  * object literals is `undefined` (optional chaining), never `null`.
  */
object JsonPretty {
  private val mapper = new ObjectMapper()

  def compute(s: UTF8String): UTF8String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.numBytes * 2)
    render(mapper.readTree(s.toString), 0, sb)
    UTF8String.fromString(sb.toString)
  }

  private def render(n: JsonNode, depth: Int, sb: java.lang.StringBuilder): Unit = {
    def indent(d: Int): Unit = { var i = 0; while (i < d * 2) { sb.append(' '); i += 1 } }
    if (n.isObject) {
      if (n.isEmpty) { sb.append("{}"); return }
      sb.append("{\n")
      val it = n.fields()
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) sb.append(",\n")
        first = false
        indent(depth + 1)
        sb.append(mapper.writeValueAsString(e.getKey)).append(": ")
        render(e.getValue, depth + 1, sb)
      }
      sb.append('\n'); indent(depth); sb.append('}')
    } else if (n.isArray) {
      if (n.isEmpty) { sb.append("[]"); return }
      sb.append("[\n")
      var i = 0
      while (i < n.size()) {
        if (i > 0) sb.append(",\n")
        indent(depth + 1)
        render(n.get(i), depth + 1, sb)
        i += 1
      }
      sb.append('\n'); indent(depth); sb.append(']')
    } else {
      // scalar (string/number/bool/null): Jackson's compact form
      // matches JSON.stringify's scalar serialization
      sb.append(mapper.writeValueAsString(n))
    }
  }
}

/** Native expression wrapper: `json_pretty(compactJson)`. */
case class JsonPretty(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_pretty requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_pretty"

  override protected def nullSafeEval(input: Any): Any =
    JsonPretty.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.JsonPretty.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): JsonPretty =
    copy(child = newChild)
}

object JsonPrettyColumn {
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      JsonPretty(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))
}
