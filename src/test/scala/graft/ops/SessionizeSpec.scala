package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gapHour = 3600L * 1000000

  private def ev(rows: (Long, Long, Long)*) =
    rows.toDF("uid", "tss", "eid")
      .select(col("uid"), to_timestamp(from_unixtime(col("tss"))).as("ts"), col("eid"))

  test("gap strictly greater than gapMicros starts a new session; exact gap does not") {
    val df = ev((1L, 0L, 1L), (1L, 3600L, 2L), (1L, 7201L, 3L))
    val out = Sessionize.sessionize(df, "uid", "ts", "eid", gapHour)
      .select("eid", "session_idx").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("sessions are independent per key; first event always opens session 1") {
    val df = ev((1L, 0L, 1L), (2L, 0L, 2L), (1L, 10000L, 3L), (2L, 100L, 4L))
    val out = Sessionize.sessionize(df, "uid", "ts", "eid", gapHour)
      .select("uid", "eid", "session_idx").as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 1L), (2L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
  }

  test("equal timestamps order by the tie column deterministically") {
    val df = ev((1L, 5000L, 9L), (1L, 5000L, 8L), (1L, 0L, 1L))
    val out = Sessionize.sessionize(df, "uid", "ts", "eid", gapHour)
      .select("eid", "session_idx").as[(Long, Long)].collect().toMap
    // eid 1 at t=0 opens session 1; gap to t=5000 > 1h → session 2 holds
    // both equal-stamp rows regardless of input order.
    assert(out === Map(1L -> 1L, 8L -> 2L, 9L -> 2L))
  }

  test("reserved column names are rejected eagerly") {
    val df = ev((1L, 0L, 1L)).withColumn("__sess_brk", lit(0))
    val e = intercept[IllegalArgumentException](
      Sessionize.sessionize(df, "uid", "ts", "eid", gapHour))
    assert(e.getMessage.contains("__sess_brk"))
  }

  test("plan moves the data once: a single exchange feeds both window projections") {
    val df = ev((1L, 0L, 1L), (1L, 10L, 2L))
    val out = Sessionize.sessionize(df, "uid", "ts", "eid", gapHour)
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected one shuffle, plan:\n$plan")
    val sorts = "\\bSort\\b".r.findAllIn(plan).size
    assert(sorts === 1, s"expected one sort feeding both windows, plan:\n$plan")
  }
}
