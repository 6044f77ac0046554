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

  /** Hop staleness in EXACT integer units — timestamps diff in epoch
    * micros, dates in epoch seconds, numerics in their own unit
    * (epoch seconds by contract). A float epoch would wobble on
    * exact `withinSeconds` boundaries (same rule as [[retention]]).
    * Strings are rejected: their ordering comparison would be
    * lexicographic while a hop bound needs parsed time — two different
    * time semantics for one column.
    */
  private def checkTimeType(dt: DataType, what: String): Unit = dt match {
    // Numeric epochs must be INTEGRAL: a float/double/decimal epoch
    // reintroduces via `time - prev <= w` exactly the boundary wobble
    // the exactness contract above rules out.
    case ByteType | ShortType | IntegerType | LongType | TimestampType | DateType => ()
    case other => throw new IllegalArgumentException(
      s"$what has unsupported time type $other; need integral epoch seconds, " +
        "timestamp or date (float epochs forfeit exact hop boundaries)")
  }

  private def hopWithin(time: Column, prev: Column, dt: DataType, w: Long): Column =
    dt match {
      case TimestampType  => unix_micros(time) - unix_micros(prev) <= w * 1000000L
      // datediff, NOT unix_timestamp: the latter is session-timezone
      // dependent — across a DST transition consecutive dates differ
      // by 82800/90000 seconds and a one-day hop bound of 86400 would
      // accept/reject by timezone. Dates are exact day counts.
      case DateType       => datediff(time, prev).cast("long") * 86400L <= w
      case _              => time - prev <= w
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
    // Stage names become OUTPUT column names only (aliased at the final
    // projection, where any character is legal); all intermediate
    // bookkeeping uses index-based names so a stage like "page.view"
    // cannot break column resolution.
    val tsInternal = stages.indices.map(i => s"__fts_$i")
    require(!events.columns.exists(_.startsWith("__fts_")),
      "reserved column name collision (__fts_*)")
    val timeType = events.schema(timeCol).dataType
    checkTimeType(timeType, "timeCol") // eager; avoids a deep analysis error

    val stageAggs = new Array[DataFrame](stages.size)
    stageAggs(0) = events.filter(col(typeCol) === stages.head)
      .groupBy(col(keyCol)).agg(min(col(timeCol)).as(tsInternal(0)))
    for (i <- 1 until stages.size) {
      val prevTs = tsInternal(i - 1)
      val hop = withinSeconds
        .map(w => hopWithin(col(timeCol), col(prevTs), timeType, w))
        .getOrElse(lit(true))
      stageAggs(i) = events.filter(col(typeCol) === stages(i))
        .join(stageAggs(i - 1).select(col(keyCol), col(prevTs)), keyCol)
        .filter(col(timeCol) > col(prevTs) && hop)
        .groupBy(col(keyCol)).agg(min(col(timeCol)).as(tsInternal(i)))
    }

    val joined = stageAggs.tail.foldLeft(stageAggs.head) { (acc, s) =>
      acc.join(s, Seq(keyCol), "left")
    }
    val depth = tsInternal.tail.map(n =>
      when(col(n).isNotNull, 1L).otherwise(0L)).reduce(_ + _) + 1L
    joined.select(
      (col(keyCol) +:
        stages.zip(tsInternal).map { case (s, n) => col(n).as(s"ts_$s") }) :+
        depth.as("depth"): _*)
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
    // FLOOR division in exact integer arithmetic: x DIV n truncates
    // toward zero, which would collapse the periods on either side of
    // the epoch into one cohort for pre-1970 data (and disagree with
    // DuckDB's `//`, which floors). pmod is the positive modulus, so
    // (x - pmod(x, n)) DIV n == floor(x / n) with no float en route.
    // The expr() operates on FIXED internal aliases only — a user
    // column name never reaches the SQL string (a legal name containing
    // a backtick would otherwise break or shift the parse).
    def period(name: String): Column = {
      val n = periodSeconds * 1000000L
      expr(s"(unix_micros($name) - pmod(unix_micros($name), $n)) DIV $n")
    }

    val first = events.groupBy(col(keyCol))
      .agg(min(col(timeCol)).as("__first_ts"))
    events.select(col(keyCol).as("__ret_k"), col(timeCol).as("__ret_t"))
      .join(first.select(col(keyCol).as("__ret_k"), col("__first_ts")), "__ret_k")
      .select(col("__ret_k"),
        period("__first_ts").as("cohort"),
        (period("__ret_t") - period("__first_ts")).as("period_offset"))
      .groupBy(col("cohort"), col("period_offset"))
      .agg(countDistinct(col("__ret_k")).as("n_active"))
  }
}
