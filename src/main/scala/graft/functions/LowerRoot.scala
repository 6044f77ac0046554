package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Locale-ROOT lowercase — deterministic lowering for dictionary keys.
  *
  * Spark's builtin `lower` is NOT locale-independent for non-ASCII
  * strings: `UTF8String.toLowerCase` takes an ASCII fast path but its
  * slow path calls `String.toLowerCase()` with the JVM DEFAULT locale
  * (verified against the shipped spark-unsafe 4.1.2 jar). On a host
  * whose default locale is tr/az/lt, `lower("IRIS")` inside a string
  * containing any non-ASCII char yields dotless-ı forms that can never
  * match a key built with `Locale.ROOT` on the driver. This expression
  * pins `String.toLowerCase(Locale.ROOT)` on both build and probe
  * sides, so broadcast-dictionary joins (e.g. the HPO/disease splitter)
  * cannot diverge with the host locale.
  *
  * Fast path: pure-ASCII input lowers byte-wise without allocating a
  * String (identical to ROOT semantics for ASCII, and the overwhelming
  * majority of ontology keys).
  */
case class LowerRoot(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lower_root requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "lower_root"

  override protected def nullSafeEval(input: Any): Any =
    LowerRoot.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = LowerRoot.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"($cls).eval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LowerRoot =
    copy(child = newChild)
}

object LowerRoot {

  def eval(s: UTF8String): UTF8String = {
    if (s == null) return null
    val n = s.numBytes()
    var ascii = true
    var hasUpper = false
    var i = 0
    while (ascii && i < n) {
      val b = s.getByte(i)
      if ((b & 0x80) != 0) ascii = false
      else if (b >= 'A' && b <= 'Z') hasUpper = true
      i += 1
    }
    if (ascii) {
      if (!hasUpper) s
      else {
        val out = new Array[Byte](n)
        var j = 0
        while (j < n) {
          val b = s.getByte(j)
          out(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          j += 1
        }
        UTF8String.fromBytes(out)
      }
    } else {
      UTF8String.fromString(s.toString.toLowerCase(java.util.Locale.ROOT))
    }
  }
}
