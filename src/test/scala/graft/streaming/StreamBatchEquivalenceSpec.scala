package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming sessionizer must agree with the batch q_sessionize
  * query on the same events — sessions are replayed from the sf0.001
  * events table through a MemoryStream and compared per (user, session)
  * against the batch window formulation.
  */
class StreamBatchEquivalenceSpec extends SparkSpec {
  import EventStreams._

  test("streaming sessions == batch sessionize on the events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
      .collect().sortBy(_.ts.getTime)

    val input = MemoryStream[Event]
    val query = sessionize(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("eqsessions")
      .outputMode("append").start()
    try {
      input.addData(events.toSeq)
      query.processAllAvailable()
      // close trailing sessions: advance the watermark far past the data
      val last = events.last.ts.getTime
      input.addData(Event(new java.sql.Timestamp(last + 48L * 3600 * 1000), -1L, "poison", 0.0))
      query.processAllAvailable()

      val streamed = spark.sql(
        "select user_id, n_events, round(session_value, 2) as v from eqsessions where user_id >= 0")
        .as[(Long, Int, Double)].collect()
        .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).sortBy(identity).toSeq).toMap

      val batch = graft.queries.Catalog.queries("q_sessionize")(spark, "/root/testdata/sf0.001")
        .select(col("user_id"), col("n_events").cast("int"), col("session_value"))
        .as[(Long, Int, Double)].collect()
        .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).sortBy(identity).toSeq).toMap

      assert(streamed.keySet == batch.keySet)
      streamed.keys.foreach { u => assert(streamed(u) == batch(u), s"user $u differs") }
    } finally query.stop()
  }
}
