package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {
  import EventStreams._

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  test("hourlyCounts: windowed aggregation over a micro-batch stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("update").start()
    try {
      input.addData(
        Event(ts("2024-01-01 00:10:00"), 1, "click", 1.0),
        Event(ts("2024-01-01 00:40:00"), 2, "click", 2.0),
        Event(ts("2024-01-01 01:10:00"), 1, "buy", 10.0))
      query.processAllAvailable()
      val rows = spark.sql("select * from hourly").collect()
      val clicks = rows.find(_.getString(1) == "click").get
      assert(clicks.getLong(2) == 2L)
      assert(clicks.getDouble(3) == 3.0)
      assert(rows.exists(_.getString(1) == "buy"))
    } finally query.stop()
  }

  test("dedupDocuments: first arrival wins, later copies within watermark dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val query = EventStreams.dedupDocuments(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", "text")
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L, "alpha"),
        (ts("2024-01-01 00:01:00"), 2L, "alpha"), // same content, same batch
        (ts("2024-01-01 00:02:00"), 3L, "beta"))
      query.processAllAvailable()
      input.addData((ts("2024-01-01 00:10:00"), 4L, "alpha")) // dup, later batch
      query.processAllAvailable()
      val kept = spark.sql("select doc_id from dedup_docs").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L), s"kept $kept")
    } finally query.stop()
  }

  test("joinWithin: stream-stream interval join pairs only in-horizon same-user events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val query = EventStreams.joinWithin(
        clicks.toDF().withColumn("event_id", col("value").cast("long")),
        purchases.toDF().withColumn("event_id", col("value").cast("long")),
        horizonSeconds = 600)
      .writeStream.format("memory").queryName("joined")
      .outputMode("append").start()
    try {
      purchases.addData(
        Event(ts("2024-01-01 00:00:00"), 1, "purchase", 100),
        Event(ts("2024-01-01 00:30:00"), 1, "purchase", 101),
        Event(ts("2024-01-01 00:00:00"), 2, "purchase", 102))
      clicks.addData(
        Event(ts("2024-01-01 00:05:00"), 1, "click", 1), // 5 min after 100 → match
        Event(ts("2024-01-01 00:31:00"), 1, "click", 2), // in-horizon of 101 only
        Event(ts("2024-01-01 00:20:00"), 2, "click", 3), // 20 min after 102 → outside
        Event(ts("2024-01-01 00:05:00"), 3, "click", 4)) // no purchases for user 3
      query.processAllAvailable()
      val pairs = spark.sql("select left_id, right_id from joined")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 100L), (2L, 101L)))
      // streaming result == the batch twin on the same data
      val batch = EventStreams.joinWithin(
        Seq(Event(ts("2024-01-01 00:05:00"), 1, "click", 1),
          Event(ts("2024-01-01 00:31:00"), 1, "click", 2),
          Event(ts("2024-01-01 00:20:00"), 2, "click", 3),
          Event(ts("2024-01-01 00:05:00"), 3, "click", 4))
          .toDF().withColumn("event_id", col("value").cast("long")),
        Seq(Event(ts("2024-01-01 00:00:00"), 1, "purchase", 100),
          Event(ts("2024-01-01 00:30:00"), 1, "purchase", 101),
          Event(ts("2024-01-01 00:00:00"), 2, "purchase", 102))
          .toDF().withColumn("event_id", col("value").cast("long")),
        horizonSeconds = 600)
        .select("left_id", "right_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === pairs)
    } finally query.stop()
  }

  test("sessionize: gap-based sessions close on timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = sessionize(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 2h gap →
      // new session; the watermark advance closes the first.
      input.addData(
        Event(ts("2024-01-01 00:00:00"), 1, "a", 1.0),
        Event(ts("2024-01-01 00:10:00"), 1, "a", 2.0))
      query.processAllAvailable()
      input.addData(Event(ts("2024-01-01 02:10:00"), 1, "a", 5.0))
      query.processAllAvailable()
      // push the watermark far ahead so the second session times out too
      input.addData(Event(ts("2024-01-01 06:00:00"), 2, "b", 0.5))
      query.processAllAvailable()
      input.addData(Event(ts("2024-01-01 09:00:00"), 2, "b", 0.5))
      query.processAllAvailable()

      val sessions = spark.sql("select * from sessions where user_id = 1")
        .orderBy("start_ts").collect()
      assert(sessions.length == 2)
      assert(sessions(0).getInt(3) == 2)                 // n_events
      assert(sessions(0).getDouble(4) == 3.0)            // session_value
      assert(sessions(1).getInt(3) == 1)
      assert(sessions(1).getDouble(4) == 5.0)
    } finally query.stop()
  }

  test("sessionize: a cross-batch late event never rewinds the session end") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = sessionize(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      // batch 1: event at 10:00 (watermark is 1h — still behind)
      input.addData(Event(ts("2024-01-01 10:00:00"), 1, "a", 1.0))
      query.processAllAvailable()
      // batch 2: LATE but within-watermark event at 09:40 — in gap
      // reach of the session; it must extend the session BACKWARD
      // (start=09:40) and leave lastTs=10:00 intact. The old
      // lastTs = t rewound the end to 09:40 and timed out early.
      input.addData(Event(ts("2024-01-01 09:40:00"), 1, "a", 2.0))
      query.processAllAvailable()
      // on-time event at 10:20 — within gap of 10:00, so SAME session
      input.addData(Event(ts("2024-01-01 10:20:00"), 1, "a", 4.0))
      query.processAllAvailable()
      // advance the watermark far ahead to flush the session
      input.addData(Event(ts("2024-01-01 15:00:00"), 2, "b", 0.0))
      query.processAllAvailable()
      input.addData(Event(ts("2024-01-01 20:00:00"), 2, "b", 0.0))
      query.processAllAvailable()

      val s = spark.sql("select * from sessions_late where user_id = 1").collect()
      assert(s.length == 1, s"one merged session expected, got ${s.length}")
      assert(s(0).getLong(1) == ts("2024-01-01 09:40:00").getTime / 1000) // start
      assert(s(0).getLong(2) == ts("2024-01-01 10:20:00").getTime / 1000) // end
      assert(s(0).getInt(3) == 3 && s(0).getDouble(4) == 7.0)
    } finally query.stop()
  }

  test("dedupDocuments: null-text documents are never deduped against each other") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val query = EventStreams.dedupDocuments(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", "text")
      .writeStream.format("memory").queryName("dedup_nulls")
      .outputMode("append").start()
    try {
      // md5(null) is null and null keys compare equal in
      // dropDuplicates — doc 2 and 3 would have been silently dropped
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L, null.asInstanceOf[String]),
        (ts("2024-01-01 00:01:00"), 2L, null.asInstanceOf[String]),
        (ts("2024-01-01 00:02:00"), 3L, null.asInstanceOf[String]),
        (ts("2024-01-01 00:03:00"), 4L, "alpha"),
        (ts("2024-01-01 00:04:00"), 5L, "alpha"))
      query.processAllAvailable()
      val kept = spark.sql("select doc_id from dedup_nulls").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L, 3L, 4L), s"kept $kept")
    } finally query.stop()
  }
}
