package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar date arithmetic the reference needs but Spark lacks as a
  * single builtin (reference `strategies/date_to_age.rs:278-322`):
  * an exact year/month/day difference with day-borrowing, matching
  * Postgres/DuckDB `age()` semantics. Composed from codegen'd builtins —
  * stays inside whole-stage codegen, no UDF.
  */
object DateTimeFns {

  /** Full calendar years/months/days from `start` to `end` (end >= start).
    * Day deficit borrows the length of the START date's month
    * (Postgres/DuckDB `age()` rule — borrowing can never go negative
    * because day(start) <= days_in_month(start)); month deficit borrows
    * 12 from years.
    */
  def calendarDiff(start: Column, end: Column): Column = {
    val d0 = dayofmonth(end) - dayofmonth(start)
    val m0 = month(end) - month(start)
    val y0 = year(end) - year(start)
    val borrow = dayofmonth(last_day(start))
    val d1 = when(d0 < 0, d0 + borrow).otherwise(d0)
    val m1 = when(d0 < 0, m0 - 1).otherwise(m0)
    val m2 = when(m1 < 0, m1 + 12).otherwise(m1)
    val y1 = when(m1 < 0, y0 - 1).otherwise(y0)
    struct(y1.as("years"), m2.as("months"), d1.as("days"))
  }

  /** ISO-8601 duration string from a calendarDiff struct, with
    * zero-valued components omitted (reference `date_to_age.rs:303-322`
    * renders through the iso8601-duration crate: `P31Y7M`, not
    * `P31Y7M0D`); an all-zero difference is `P0Y`.
    */
  def toIso8601(diff: Column): Column = {
    val y = diff.getField("years")
    val m = diff.getField("months")
    val d = diff.getField("days")
    def part(v: Column, unit: String): Column =
      when(v > 0, concat(v.cast("string"), lit(unit))).otherwise(lit(""))
    // a NEGATIVE difference (end before start) renders null, matching
    // CalendarAgeIso — dropping the negative components would emit the
    // bare invalid string "P" (which iso8601DurationRegex itself
    // rejects) or a silently truncated duration
    when(y < 0 || (y === 0 && (m < 0 || (m === 0 && d < 0))),
        lit(null).cast("string"))
      .when(y === 0 && m === 0 && d === 0, lit("P0Y"))
      .otherwise(concat(lit("P"), part(y, "Y"), part(m, "M"), part(d, "D")))
  }

  /** ISO-8601 duration validation regex (reference `constants.rs:22`). */
  val iso8601DurationRegex: String =
    "^P(?!$)(\\d+Y)?(\\d+M)?(\\d+W)?(\\d+D)?(T(?=\\d)(\\d+H)?(\\d+M)?(\\d+(\\.\\d+)?S)?)?$"
}
