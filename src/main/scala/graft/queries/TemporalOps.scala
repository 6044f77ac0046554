package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TemporalJoin
import graft.queries.Catalog.{Entry, Q}

/** Gate queries for the temporal join operators (`graft.ops.TemporalJoin`).
  *
  * Shapes mirror the reference's longitudinal-record pairing (most
  * recent observation at-or-before an encounter; events inside a
  * treatment window) re-cast onto the synthetic `events` table: clicks
  * are the probe side, purchases the attribute side, `user_id` the
  * entity key.
  *
  * Timestamps never appear in the output — events.parquet is
  * TIMESTAMP(NANOS), which Spark reads truncated to micros while DuckDB
  * keeps nanos; ids and values hash identically, raw timestamps would
  * not. (Truncation cannot flip any comparison here: the generator
  * emits whole-microsecond stamps, verified per scale factor.)
  */
object TemporalOps {

  // temporal_asof — for every click, the user's most recent purchase
  // at-or-before the click (DuckDB ASOF LEFT JOIN is the oracle).
  private val tAsof: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    TemporalJoin.asofBackward(clicks, purchases,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("purchase_id", "purchase_value"))
      .select("click_id", "user_id", "purchase_id", "purchase_value")
  }

  private val tAsofSql =
    """SELECT l.event_id AS click_id, l.user_id,
      |  r.event_id AS purchase_id, r.value AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin

  // temporal_asof_tol — same join with a 48-hour staleness bound:
  // matches older than 2 days are nulled. DuckDB has no ASOF tolerance,
  // so the oracle is the correlated top-1 lateral formulation (fine at
  // oracle scale; the Spark side stays the single-shuffle merge plan).
  private val tAsofTol: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    TemporalJoin.asofBackward(clicks, purchases,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("purchase_id", "purchase_value"),
        tolerance = Some(172800L))
      .select("click_id", "user_id", "purchase_id", "purchase_value")
  }

  private val tAsofTolSql =
    """SELECT l.event_id AS click_id, l.user_id,
      |  r.purchase_id, r.purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |LEFT JOIN LATERAL (
      |  SELECT p.event_id AS purchase_id, p.value AS purchase_value
      |  FROM events p
      |  WHERE p.event_type = 'purchase' AND p.user_id = l.user_id
      |    AND p.ts <= l.ts AND epoch(l.ts) - epoch(p.ts) <= 172800
      |  ORDER BY p.ts DESC LIMIT 1
      |) r ON true""".stripMargin

  // temporal_asof_fwd — earliest purchase at-or-after each click
  // (DuckDB ASOF accepts the <= inequality for the forward direction).
  private val tAsofFwd: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    TemporalJoin.asofForward(clicks, purchases,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("purchase_id", "purchase_value"))
      .select("click_id", "user_id", "purchase_id", "purchase_value")
  }

  private val tAsofFwdSql =
    """SELECT l.event_id AS click_id, l.user_id,
      |  r.event_id AS purchase_id, r.value AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin

  // temporal_asof_near — the purchase closest in time to each click,
  // either direction; equidistant ties go to the backward (earlier)
  // candidate, which the oracle's (|Δt|, ts) ordering reproduces.
  private val tAsofNear: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    TemporalJoin.asofNearest(clicks, purchases,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("purchase_id", "purchase_value"))
      .select("click_id", "user_id", "purchase_id", "purchase_value")
  }

  private val tAsofNearSql =
    """SELECT l.event_id AS click_id, l.user_id,
      |  r.purchase_id, r.purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |LEFT JOIN LATERAL (
      |  SELECT p.event_id AS purchase_id, p.value AS purchase_value
      |  FROM events p
      |  WHERE p.event_type = 'purchase' AND p.user_id = l.user_id
      |  ORDER BY abs(epoch(l.ts) - epoch(p.ts)), p.ts LIMIT 1
      |) r ON true""".stripMargin

  // temporal_asof_salted — the skew-hardened two-level plan, same
  // semantics as temporal_asof and checked against the SAME ASOF JOIN
  // oracle: bounded per-(key, slice) window tasks + a tiny per-key
  // carry across slice boundaries. Weekly slices over the one-month
  // event range → every key spreads over ~5 tasks.
  private val tAsofSalted: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    TemporalJoin.asofBackwardSalted(clicks, purchases,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("purchase_id", "purchase_value"),
        sliceSeconds = 7L * 86400L)
      .select("click_id", "user_id", "purchase_id", "purchase_value")
  }

  // temporal_range — every click landing within one day after a
  // purchase by the same user (half-open: strictly after the purchase,
  // at-or-before purchase + 1 day). Bin width = the interval width, so
  // each interval explodes over at most 2 buckets.
  private val tRange: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 1 DAY")).as("end_ts"),
        col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    TemporalJoin.pointsInIntervals(purchases, clicks,
        keys = Seq("user_id"), startCol = "start_ts", endCol = "end_ts",
        timeCol = "ts", binSeconds = 86400L)
      .select("user_id", "purchase_id", "click_id")
  }

  private val tRangeSql =
    """SELECT i.user_id, i.event_id AS purchase_id, p.event_id AS click_id
      |FROM events i JOIN events p
      |  ON p.user_id = i.user_id
      | AND p.ts > i.ts AND p.ts <= i.ts + INTERVAL 1 DAY
      |WHERE i.event_type = 'purchase' AND p.event_type = 'click'""".stripMargin

  // temporal_overlap — purchase windows [ts, ts+6h] × error windows
  // [ts, ts+6h] of the same user that overlap (closed intervals,
  // touching counts). Bin = the window width.
  private val tOverlap: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_start"),
        (col("ts") + expr("INTERVAL 6 HOUR")).as("p_end"),
        col("event_id").as("purchase_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("e_start"),
        (col("ts") + expr("INTERVAL 6 HOUR")).as("e_end"),
        col("event_id").as("error_id"))
    TemporalJoin.intervalsOverlap(purchases, errors,
        keys = Seq("user_id"), aStart = "p_start", aEnd = "p_end",
        bStart = "e_start", bEnd = "e_end", binSeconds = 21600L)
      .select("user_id", "purchase_id", "error_id")
  }

  private val tOverlapSql =
    """SELECT i.user_id, i.event_id AS purchase_id, e.event_id AS error_id
      |FROM events i JOIN events e
      |  ON e.user_id = i.user_id
      | AND i.ts <= e.ts + INTERVAL 6 HOUR
      | AND e.ts <= i.ts + INTERVAL 6 HOUR
      |WHERE i.event_type = 'purchase' AND e.event_type = 'error'""".stripMargin

  // events_zscore — per-type outlier flagging. The scale-correct shape:
  // a tiny groupBy aggregate (one row per event_type) broadcast back,
  // NOT an avg/stddev window over the whole fact table (which would
  // shuffle + sort every row to compute four numbers). Predicate is on
  // the ROUNDED z so the engines' float-sum-order difference cannot
  // flip a row across the threshold.
  private val tZscore: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val stats = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("__m"), stddev_samp(col("value")).as("__sd"))
    val z = round((col("value") - col("__m")) / col("__sd"), 4)
    ev.join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"), z.as("z"))
      .filter(abs(col("z")) > 2.0)
  }

  private val tZscoreSql =
    """SELECT event_id, event_type, z FROM (
      |  SELECT e.event_id, e.event_type,
      |    round((e.value - s.m) / s.sd, 4) AS z
      |  FROM events e JOIN (
      |    SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd
      |    FROM events GROUP BY event_type) s USING (event_type)) t
      |WHERE abs(z) > 2.0""".stripMargin

  def entries: Seq[Entry] = Seq(
    Entry("events_zscore", tZscore, Some(tZscoreSql)),
    Entry("temporal_asof", tAsof, Some(tAsofSql)),
    Entry("temporal_asof_tol", tAsofTol, Some(tAsofTolSql)),
    Entry("temporal_asof_fwd", tAsofFwd, Some(tAsofFwdSql)),
    Entry("temporal_asof_near", tAsofNear, Some(tAsofNearSql)),
    Entry("temporal_asof_salted", tAsofSalted, Some(tAsofSql)),
    Entry("temporal_range", tRange, Some(tRangeSql)),
    Entry("temporal_overlap", tOverlap, Some(tOverlapSql)))
}
