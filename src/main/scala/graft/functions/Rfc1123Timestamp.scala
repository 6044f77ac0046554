package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC-822/1123 datetime parse ("Mon, 04 Sep 2025 11:00:59 GMT") →
  * timestamp micros, or null.
  *
  * The reference accepts this form in its datetime cascade
  * (`phenoxtract/src/constants.rs:18` — `%a, %d %b %Y %H:%M:%S GMT`).
  * Spark ≥3 rejects week-day letters in its own datetime patterns, so
  * this is a native expression around
  * `java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME` — codegen'd
  * as a static call, no UDF boxing.
  */
case class Rfc1123Timestamp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rfc1123_timestamp requires a string argument, got ${child.dataType}")
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "rfc1123_timestamp"

  override protected def nullSafeEval(input: Any): Any =
    Rfc1123Timestamp.evalBoxed(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Rfc1123Timestamp.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Long $boxed = ($cls).evalBoxed($c);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Rfc1123Timestamp =
    copy(child = newChild)
}

object Rfc1123Timestamp {
  import java.time.ZonedDateTime
  import java.time.format.DateTimeFormatter

  /** Micros since epoch, or null when the string is not RFC-1123. */
  def evalBoxed(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    try {
      val zdt = ZonedDateTime.parse(s.toString.trim, DateTimeFormatter.RFC_1123_DATE_TIME)
      val i = zdt.toInstant
      java.lang.Long.valueOf(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    } catch { case _: java.time.format.DateTimeParseException => null }
  }
}
