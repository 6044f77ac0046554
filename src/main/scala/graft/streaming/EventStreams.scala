package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming twins of the batch event queries: tumbling-window
  * aggregation with watermarks and gap-based session windows via
  * `flatMapGroupsWithState` (the reference is strictly batch — streaming
  * is the engine's extension surface, SURVEY.md §2.9/§7).
  *
  * Both transforms accept any streaming DataFrame with the events
  * schema (ts timestamp, user_id long, event_type string, value double),
  * e.g. a Kafka/file/rate source at scale or a MemoryStream in tests.
  * State is keyed per user: the shuffle partitions by user_id and state
  * lives in the state store (RocksDB at scale), so the operator scales
  * with executors, not with total history.
  */
object EventStreams {

  /** Tumbling 1-hour windowed counts/sums per event type; late events
    * beyond the watermark are dropped instead of growing state forever.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup for a document feed: the FIRST arrival of
    * each content fingerprint passes, later copies within the
    * watermark horizon are dropped. State is one 16-byte digest per
    * distinct document, keyed in the state store (RocksDB at scale)
    * and EXPIRED by the watermark — bounded state, unlike a naive
    * `dropDuplicates` whose fingerprint set grows forever.
    */
  def dedupDocuments(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      // null text has no content fingerprint: md5(null) is null and
      // dropDuplicates treats null keys as EQUAL, so every later
      // null-text document would be silently dropped as a "duplicate"
      // of the first. A per-row uuid makes each such row unique — null
      // text is never deduped, only fingerprinted content is.
      .withColumn("__fp", coalesce(md5(col(textCol)), uuid()))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Watermarked stream-stream interval join: every left event paired
    * with the same user's right events from the preceding
    * `horizonSeconds` (`left.ts - horizon <= right.ts <= left.ts`) —
    * the streaming twin of `ops.TemporalJoin.pointsInIntervals`
    * (attribution: clicks to recent purchases, symptoms to recent
    * doses).
    *
    * Both inputs carry watermarks AND the join condition bounds event
    * time on both sides — that pair is what lets Spark expire buffered
    * rows from the state store; with either missing, stream-stream
    * join state grows forever. Matches emit as they arrive (inner
    * join); state is evicted `watermark` past the horizon.
    */
  def joinWithin(left: DataFrame, right: DataFrame,
      horizonSeconds: Long = 3600, watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("left_id"), col("user_id"), col("ts").as("left_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as("right_id"), col("user_id").as("__r_user"),
        col("ts").as("right_ts"))
    l.join(r,
        col("user_id") === col("__r_user") &&
          col("right_ts") >= col("left_ts") - expr(s"INTERVAL $horizonSeconds SECONDS") &&
          col("right_ts") <= col("left_ts"))
      .select(col("left_id"), col("user_id"), col("right_id"),
        col("left_ts"), col("right_ts"))
  }

  final case class Event(ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Int, sum: Double)
  final case class Session(user_id: Long, start_ts: Long, end_ts: Long,
      n_events: Int, session_value: Double)

  /** Gap-based sessionization (30-min idle timeout): sessions close via
    * event-time timeout; one state entry per active user.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.lastTs, s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var current = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              current match {
                // CROSS-BATCH late event older than the session's
                // backward gap reach: it cannot belong to the current
                // session (and any session it did belong to already
                // closed) — emit it as its own closed singleton rather
                // than swallowing it and rewinding state.
                case Some(s) if t < s.start - gapSeconds =>
                  closed ::= Session(userId, t, t, 1, e.value)
                case Some(s) if t - s.lastTs <= gapSeconds =>
                  // min/max guards: a late-but-in-gap event must EXTEND
                  // the session backward, never rewind lastTs — a bare
                  // lastTs = t would corrupt end_ts (even end < start)
                  // and fire the idle timeout gapSeconds too early.
                  current = Some(s.copy(start = math.min(s.start, t),
                    lastTs = math.max(s.lastTs, t), n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= Session(userId, s.start, s.lastTs, s.n, s.sum)
                  current = Some(SessionState(t, t, 1, e.value))
                case None =>
                  current = Some(SessionState(t, t, 1, e.value))
              }
            }
            current.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs * 1000 + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
