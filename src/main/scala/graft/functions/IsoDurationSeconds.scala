package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ISO-8601 duration string → total seconds
  * (calendar-free convention: 1Y = 365.25 d, 1M = 30.4375 d — the
  * astronomical year/month averages, stated so the oracle can mirror
  * them). Null for null input or non-ISO-8601 strings.
  *
  * This is the engine's "custom Expression beats UDF" path (builder
  * brief / SURVEY §7.3): ISO durations are the reference's pervasive
  * time representation (`constants.rs:22`), turning them into a sortable
  * numeric is not expressible with Spark builtins short of a multi-regex
  * expression forest, and a Scala UDF would box every row and block
  * codegen. `doGenCode` emits a static call — the expression stays
  * inside whole-stage codegen.
  */
case class IsoDurationSeconds(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"iso_duration_seconds requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "iso_duration_seconds"

  override protected def nullSafeEval(input: Any): Any =
    IsoDurationSeconds.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = IsoDurationSeconds.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Long $boxed = ($cls).evalBoxed($c);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): IsoDurationSeconds =
    copy(child = newChild)
}

object IsoDurationSeconds {
  private val Re =
    ("^P(?!$)(?:(\\d+)Y)?(?:(\\d+)M)?(?:(\\d+)W)?(?:(\\d+)D)?" +
      "(?:T(?=\\d)(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+(?:\\.\\d+)?)S)?)?$").r

  final val SecondsPerYear: Long = 31557600L  // 365.25 d
  final val SecondsPerMonth: Long = 2629800L  // 30.4375 d

  def eval(s: UTF8String): Any = evalBoxed(s)

  /** Boxed variant for generated code (null = unparseable). A
    * regex-valid component too large for a Long (or a sum overflowing
    * one) is also null — the documented "null for non-ISO-8601"
    * contract must not turn into an uncaught NumberFormatException
    * killing the task, nor a silent negative wrap.
    */
  def evalBoxed(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    Re.findFirstMatchIn(s.toString.trim) match {
      case None => null
      case Some(m) =>
        try {
          def g(i: Int): Long = Option(m.group(i)).map(_.toLong).getOrElse(0L)
          val secs = Math.addExact(Math.addExact(Math.addExact(
            Math.addExact(Math.addExact(Math.addExact(
              Math.multiplyExact(g(1), SecondsPerYear),
              Math.multiplyExact(g(2), SecondsPerMonth)),
              Math.multiplyExact(g(3), 7L * 86400L)),
              Math.multiplyExact(g(4), 86400L)),
              Math.multiplyExact(g(5), 3600L)),
              Math.multiplyExact(g(6), 60L)),
            Option(m.group(7)).map(v => math.round(v.toDouble)).getOrElse(0L))
          java.lang.Long.valueOf(secs)
        } catch {
          case _: NumberFormatException | _: ArithmeticException => null
        }
    }
  }
}
