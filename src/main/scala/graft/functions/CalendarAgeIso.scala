package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact calendar age between two dates as an ISO-8601 duration string
  * (`P41Y10M22D`, zero components omitted, all-zero → `P0Y`).
  *
  * Same semantics as `DateTimeFns.calendarDiff` + `toIso8601`
  * (Postgres/DuckDB `age()` day-borrow-from-START-month rule; reference
  * `date_to_age.rs:278-322`), but as ONE native expression: the
  * column-algebra version re-inlines the whole diff tree into every
  * component reference (y twice, m three times, d three times — each
  * dragging the multi-format date parse along), which grew generated
  * methods past what janino compiles and dropped the stage to
  * interpreted eval. A static call keeps the projection inside
  * whole-stage codegen. Null when either side is null; negative spans
  * yield null (callers pre-check and error, reference semantics).
  */
case class CalendarAgeIso(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (DateType, DateType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"calendar_age_iso requires two date arguments, got $l and $r")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "calendar_age_iso"

  override protected def nullSafeEval(start: Any, end: Any): Any =
    CalendarAgeIso.evalBoxed(start.asInstanceOf[Int], end.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CalendarAgeIso.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val out = ctx.freshName("out")
    nullSafeCodeGen(ctx, ev, (s, e) =>
      s"""
         |UTF8String $out = ($cls).evalBoxed($s, $e);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CalendarAgeIso =
    copy(left = newLeft, right = newRight)
}

object CalendarAgeIso {
  import java.time.LocalDate

  /** Dates arrive as epoch days (Spark DateType physical type). */
  def evalBoxed(startDays: Int, endDays: Int): UTF8String = {
    if (endDays < startDays) return null
    val start = LocalDate.ofEpochDay(startDays.toLong)
    val end = LocalDate.ofEpochDay(endDays.toLong)
    var d = end.getDayOfMonth - start.getDayOfMonth
    var m = end.getMonthValue - start.getMonthValue
    var y = end.getYear - start.getYear
    if (d < 0) { d += start.lengthOfMonth(); m -= 1 } // borrow from START month
    if (m < 0) { m += 12; y -= 1 }
    val sb = new java.lang.StringBuilder(16)
    sb.append('P')
    if (y > 0) sb.append(y).append('Y')
    if (m > 0) sb.append(m).append('M')
    if (d > 0) sb.append(d).append('D')
    if (sb.length == 1) sb.append("0Y")
    UTF8String.fromString(sb.toString)
  }
}
