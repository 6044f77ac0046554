package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // (user, type, epoch-seconds) — numeric time keeps the fixtures terse
  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("u", "t", "ts")

  test("depth counts only in-order progressions; abandoners keep partial stages") {
    val events = ev(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L), // full funnel
      (2L, "view", 10L), (2L, "click", 20L),                   // no purchase
      (3L, "view", 10L), (3L, "buy", 5L),                      // buy BEFORE view: no credit
      (4L, "click", 10L), (4L, "buy", 20L))                    // never viewed: absent
    val out = Funnel.funnel(events, "u", "t", "ts", Seq("view", "click", "buy"))
      .select("u", "depth").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("strict ordering: a same-instant next stage does not advance the funnel") {
    val events = ev((1L, "view", 10L), (1L, "click", 10L), (1L, "click", 11L))
    val out = Funnel.funnel(events, "u", "t", "ts", Seq("view", "click"))
      .select("u", "ts_click", "depth").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 11L, 2L))) // the 10s click is simultaneous — skipped
  }

  test("earliest qualifying time per stage wins, not earliest overall") {
    val events = ev(
      (1L, "view", 100L),
      (1L, "click", 50L),   // before the view — not qualifying
      (1L, "click", 200L), (1L, "click", 150L))
    val out = Funnel.funnel(events, "u", "t", "ts", Seq("view", "click"))
      .select("ts_view", "ts_click").as[(Long, Long)].first()
    assert(out == ((100L, 150L)))
  }

  test("withinSeconds bounds each hop, not the whole funnel") {
    val events = ev(
      (1L, "view", 0L), (1L, "click", 50L), (1L, "buy", 99L),   // hops 50 + 49
      (2L, "view", 0L), (2L, "click", 200L), (2L, "buy", 210L)) // first hop too slow
    val out = Funnel.funnel(events, "u", "t", "ts", Seq("view", "click", "buy"),
      withinSeconds = Some(60L))
      .select("u", "depth").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 1L))
  }

  test("retention: cohorts by first-event period, distinct counts per offset") {
    // period = 100s; user 1 starts in period 0, active in 0 and 2;
    // user 2 starts period 0, active 0 only; user 3 starts period 2.
    val events = Seq(
      (1L, 10L), (1L, 50L), (1L, 250L),
      (2L, 90L),
      (3L, 220L), (3L, 310L))
      .toDF("u", "sec")
      .select(col("u"), timestamp_seconds(col("sec")).as("ts"))
    val out = Funnel.retention(events, "u", "ts", periodSeconds = 100L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 0L, 2L),  // users 1,2 active in their first period
      (0L, 2L, 1L),  // user 1 returns two periods later
      (2L, 0L, 1L),  // user 3's cohort
      (2L, 1L, 1L))) // user 3 returns next period
  }

  test("retention rejects non-timestamp time and non-positive periods") {
    val events = ev((1L, "view", 1L))
    intercept[IllegalArgumentException] {
      Funnel.retention(events, "u", "ts", 100L) // ts is long, not timestamp
    }
    intercept[IllegalArgumentException] {
      Funnel.retention(events.select(col("u"),
        timestamp_seconds(col("ts")).as("ts")), "u", "ts", 0L)
    }
  }

  test("rejects duplicate stages, short funnels, and bad time types") {
    val events = ev((1L, "view", 1L))
    intercept[IllegalArgumentException] {
      Funnel.funnel(events, "u", "t", "ts", Seq("view", "view"))
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(events, "u", "t", "ts", Seq("view"))
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(events.withColumn("ts", array(lit(1))), "u", "t", "ts",
        Seq("view", "click"))
    }
    // strings would compare lexicographically but hop-bound by parsing
    // — two time semantics for one column; rejected eagerly
    intercept[IllegalArgumentException] {
      Funnel.funnel(events.withColumn("ts", lit("2024-01-01")), "u", "t", "ts",
        Seq("view", "click"))
    }
  }

  test("hop bound is exact at the boundary for timestamps (no float wobble)") {
    // 1073709839212022 us + exactly 604800 s: double epoch-seconds math
    // computes a difference of 604800.0000001192 and drops the hop.
    val base = 1073709839212022L
    val events = Seq((1L, "view", base), (1L, "click", base + 604800L * 1000000L))
      .toDF("u", "t", "us")
      .select(col("u"), col("t"), timestamp_micros(col("us")).as("ts"))
    val out = Funnel.funnel(events, "u", "t", "ts", Seq("view", "click"),
      withinSeconds = Some(604800L))
      .select("depth").as[Long].first()
    assert(out == 2L, "an event exactly withinSeconds later must count")
  }

  test("stage names with dots survive (internal columns are index-named)") {
    val events = ev((1L, "page.view", 10L), (1L, "checkout.start", 20L))
    val out = Funnel.funnel(events, "u", "t", "ts", Seq("page.view", "checkout.start"))
    assert(out.columns.toSeq == Seq("u", "ts_page.view", "ts_checkout.start", "depth"))
    assert(out.select(col("depth")).as[Long].first() == 2L)
  }
}
