package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered funnel analysis: for every key, the earliest time each
  * stage was reached STRICTLY AFTER the previous stage (the classic
  * view → click → purchase progression question).
  *
  * Formulated as a chain of per-stage aggregates — stage i is
  * `min(time)` over the stage-i events later than the key's stage-i−1
  * time — joined left-outer so every key that entered the funnel
  * appears with its depth. No window over per-key event sequences and
  * no collect of per-key arrays: every stage is a filtered
  * shuffle-join between pre-aggregated (key, ts) rows and the
  * stage-filtered events, all partial-aggregable — the shape that
  * survives keys with millions of events.
  *
  * Progression is strict (`>`): an event at the same instant as the
  * previous stage does not advance the funnel (deterministic under
  * ties; same-timestamp multi-stage progressions are ambiguous in any
  * engine). `withinSeconds` bounds each HOP (stage i within w seconds
  * of stage i−1), not the whole funnel.
  */
object Funnel {

  private def epochFine(c: Column, dt: DataType, what: String): Column = dt match {
    case _: NumericType         => c.cast(DoubleType)
    case TimestampType          => c.cast(DoubleType)
    case DateType | StringType  => unix_timestamp(c).cast(DoubleType)
    case other =>
      throw new IllegalArgumentException(
        s"$what has unsupported time type $other; need numeric epoch, timestamp, date or string")
  }

  /** @return one row per key that reached stage 0: the key, one
    *         `ts_<stage>` column per stage (null once the funnel was
    *         abandoned), and `depth` (1-based deepest stage reached).
    */
  def funnel(
      events: DataFrame,
      keyCol: String,
      typeCol: String,
      timeCol: String,
      stages: Seq[String],
      withinSeconds: Option[Long] = None): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.distinct.size == stages.size,
      "stages must be distinct (a repeated stage makes ts_<stage> ambiguous)")
    withinSeconds.foreach(w => require(w > 0, "withinSeconds must be positive"))
    val missing = Seq(keyCol, typeCol, timeCol).filterNot(events.columns.contains)
    require(missing.isEmpty, s"events is missing column(s): ${missing.mkString(", ")}")
    val tsNames = stages.map(s => s"ts_$s")
    require(!tsNames.exists(events.columns.contains) && !events.columns.contains("depth"),
      "reserved column name collision (ts_<stage> / depth)")
    val timeType = events.schema(timeCol).dataType
    epochFine(col(timeCol), timeType, "timeCol") // eager type gate

    val stageAggs = stages.zipWithIndex.map { case (stage, i) =>
      if (i == 0)
        events.filter(col(typeCol) === stage)
          .groupBy(col(keyCol)).agg(min(col(timeCol)).as(tsNames(0)))
      else null // filled below (needs the previous aggregate)
    }.toArray
    for (i <- 1 until stages.size) {
      val prevTs = tsNames(i - 1)
      val hop = withinSeconds.map { w =>
        epochFine(col(timeCol), timeType, "timeCol") -
          epochFine(col(prevTs), timeType, "timeCol") <= w.toDouble
      }.getOrElse(lit(true))
      stageAggs(i) = events.filter(col(typeCol) === stages(i))
        .join(stageAggs(i - 1).select(col(keyCol), col(prevTs)), keyCol)
        .filter(col(timeCol) > col(prevTs) && hop)
        .groupBy(col(keyCol)).agg(min(col(timeCol)).as(tsNames(i)))
    }

    val joined = stageAggs.tail.foldLeft(stageAggs.head) { (acc, s) =>
      acc.join(s, Seq(keyCol), "left")
    }
    val depth = tsNames.tail.map(n =>
      when(col(n).isNotNull, 1L).otherwise(0L)).reduce(_ + _) + 1L
    joined.withColumn("depth", depth)
  }

  /** Cohort retention: keys are cohorted by the period of their FIRST
    * event; every (cohort, period-offset) cell counts the distinct
    * keys active that many periods later — the retention-matrix
    * primitive.
    *
    * Period arithmetic is integer division of epoch microseconds
    * (exact and engine-portable; a float epoch would wobble on period
    * boundaries). Two partial-aggregable shuffles (first-event agg,
    * cell count) plus one equi-join of events against the per-key
    * first timestamps — nothing holds per-key sequences, so keys with
    * millions of events cost no more than their row count.
    *
    * @param periodSeconds cohort/offset bucket width (e.g. 604800 = weekly)
    */
  def retention(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be positive")
    val missing = Seq(keyCol, timeCol).filterNot(events.columns.contains)
    require(missing.isEmpty, s"events is missing column(s): ${missing.mkString(", ")}")
    require(!events.columns.contains("__first_ts"),
      "reserved column name collision (__first_ts)")
    require(events.schema(timeCol).dataType == TimestampType,
      s"timeCol must be a timestamp, got ${events.schema(timeCol).dataType}")
    // SQL DIV (integral division) — the Scala Column API only exposes
    // fractional `/`; both engines' integral division agrees exactly.
    def period(name: String): Column =
      expr(s"unix_micros(`$name`) DIV ${periodSeconds * 1000000L}")

    val first = events.groupBy(col(keyCol))
      .agg(min(col(timeCol)).as("__first_ts"))
    events.select(col(keyCol), col(timeCol))
      .join(first, keyCol)
      .select(col(keyCol),
        period("__first_ts").as("cohort"),
        (period(timeCol) - period("__first_ts")).as("period_offset"))
      .groupBy(col("cohort"), col("period_offset"))
      .agg(countDistinct(col(keyCol)).as("n_active"))
  }
}
