package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling-hash document fingerprint: the minimum
  * polynomial hash over all `k`-char windows of the string (winnowing
  * with window = whole document). One O(n) pass — each window's hash
  * derives from the previous in O(1) via the rolling recurrence
  *
  *   h' = ((h − c_out·B^(k−1))·B + c_in) mod M,  B=131, M=1e9+7
  *
  * which equals the stepwise-mod polynomial a SQL oracle can spell per
  * window (same residues), so the result is cross-engine checkable —
  * unlike engine hash() builtins. Characters are UTF-16 code units
  * (= code points on the BMP; the corpora here are ASCII). Strings
  * shorter than k hash as one whole-string window.
  */
object RollingMinHash {
  val B = 131L
  val M = 1000000007L
  val K = 8

  def compute(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    val str = s.toString
    val n = str.length
    if (n == 0) return null
    val k = math.min(K, n)
    // B^(k-1) mod M for the roll-out term
    var bk = 1L
    var j = 1
    while (j < k) { bk = bk * B % M; j += 1 }
    // first window, stepwise mod
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + str.charAt(i)) % M; i += 1 }
    var min = h
    // roll
    i = k
    while (i < n) {
      val out = str.charAt(i - k)
      h = (h - out * bk % M + M) % M
      h = (h * B + str.charAt(i)) % M
      if (h < min) min = h
      i += 1
    }
    Long.box(min)
  }
}

/** Native Catalyst expression wrapper — codegen calls the static
  * kernel (single linear scan, no per-window substring allocation). */
case class RollingMinHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_min_hash requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_min_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingMinHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("rollhash")
      s"""
        java.lang.Long $r = graft.functions.RollingMinHash.compute($c);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHashColumn {
  def apply(c: Column): Column =
    ColumnBridge.column(RollingMinHash(ColumnBridge.expression(c)))
}
