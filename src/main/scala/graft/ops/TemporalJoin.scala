package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal joins: as-of (merge) join and point-in-interval range join.
  *
  * Spark has no native as-of or range join operator; the naive
  * formulations are scale-killers (a `t1.ts >= t2.ts` theta-join is a
  * per-key cartesian product that BroadcastNestedLoopJoin "solves" only
  * while one side fits on the driver). Both operators below are
  * re-expressed as ONE hash shuffle + linear per-partition work, which
  * is the shape that survives a 1000-executor 100 TB run:
  *
  *  - as-of: union both sides, one window sort per key, last-non-null
  *    carry-forward — a distributed merge-as-of (the same plan kdb/
  *    Pandas `merge_asof` run single-node, parallelized by key);
  *  - range: bin time into fixed buckets, explode each interval over
  *    the buckets it covers, equi-join on (key, bucket) + residual
  *    predicate — turns the range predicate into a hash-join key so
  *    Catalyst never falls back to a nested-loop join.
  */
object TemporalJoin {

  /** Seconds-since-epoch for any sane time column type: numeric columns
    * are taken as epoch seconds verbatim; timestamp/date/string go
    * through `unix_timestamp`. Anything else is rejected eagerly (the
    * silent alternative is an analysis error deep inside the plan).
    */
  private def epochSeconds(c: Column, dt: DataType, what: String): Column = dt match {
    case _: NumericType                          => c.cast(LongType)
    case TimestampType | DateType | StringType   => unix_timestamp(c)
    case other =>
      throw new IllegalArgumentException(
        s"$what has unsupported time type $other; need numeric epoch, timestamp, date or string")
  }

  /** Fractional epoch seconds, for tolerance/distance math. Matching
    * the oracle engine bit-for-bit matters here: DuckDB's `epoch()` is
    * a fractional double, so truncated whole-second math would disagree
    * with it for sub-second timestamp components near a threshold.
    * Timestamps cast to double are exact for micro-precision data in
    * both engines (same real number, same double rounding).
    */
  private def epochFine(c: Column, dt: DataType, what: String): Column = dt match {
    case _: NumericType           => c.cast(DoubleType)
    case TimestampType            => c.cast(DoubleType)
    case DateType | StringType    => unix_timestamp(c).cast(DoubleType)
    case other =>
      throw new IllegalArgumentException(
        s"$what has unsupported time type $other; need numeric epoch, timestamp, date or string")
  }

  /** Eager version of the [[epochSeconds]] type gate, run before any
    * plan is built — otherwise a bad time column surfaces as an opaque
    * analysis error from deep inside the union/join.
    */
  private def checkTimeType(dt: DataType, what: String): Unit = dt match {
    case _: NumericType | TimestampType | DateType | StringType => ()
    case other => throw new IllegalArgumentException(
      s"$what has unsupported time type $other; need numeric epoch, timestamp, date or string")
  }

  private def timeClass(dt: DataType): String = dt match {
    case _: NumericType => "numeric"
    case TimestampType | DateType => "datetime"
    case _ => "string"
  }

  /** All time columns that meet in one comparison/bin computation must
    * be the same CLASS of time: mixed classes either die in analysis
    * with an opaque type-mismatch or — worse — silently diverge
    * (Spark's lenient comparison cast accepts ISO strings that strict
    * `unix_timestamp` nulls, so a row can pass the residual predicate
    * yet never land in a bin). Reject eagerly, like the as-of path.
    */
  private def requireSameTimeClass(cols: (DataType, String)*): Unit = {
    val classes = cols.map { case (dt, w) => s"$w (${dt.simpleString}: ${timeClass(dt)})" }
    require(cols.map(c => timeClass(c._1)).distinct.size == 1,
      s"time columns must all be the same kind: ${classes.mkString(", ")}")
  }

  private def requireCols(df: DataFrame, cols: Seq[String], side: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"$side side is missing column(s): ${missing.mkString(", ")}")
  }

  /** Backward (most-recent-at-or-before) as-of join.
    *
    * For every left row, attaches the `payload` columns of the right
    * row with the greatest `rightTime` <= the left row's `leftTime`
    * within the same `keys` group; null when no such row (left-outer
    * semantics, same as DuckDB `ASOF LEFT JOIN` / pandas `merge_asof`).
    *
    * Right rows must be unique per (keys, rightTime) — pre-aggregate
    * otherwise, or the tie-winner is nondeterministic.
    *
    * Plan: one shuffle (hash partition by `keys`), one sort within
    * partitions, no join node at all. A left row at the same instant
    * as a right row DOES see it (inclusive), because the right side
    * sorts first at equal timestamps. All payload columns ride in ONE
    * struct column so a right row whose payload value is null still
    * wins (per-column `last(ignoreNulls)` would skip it and resurrect
    * an older row's value — wrong row semantics).
    *
    * Scale note: one window partition per key value; a single hot key
    * serializes into one task. Use [[asofBackwardSalted]] when key
    * skew is expected — identical semantics, bounded tasks.
    *
    * @param tolerance optional max staleness in seconds: matches older
    *                  than `leftTime - tolerance` are nulled out.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val (unioned, leftCols, _) = asofUnion(left, right, keys, leftTime, rightTime, payload)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .withColumn("__asof_row", last(col("__asof_row"), ignoreNulls = true).over(w))
    asofFinish(filled, leftCols, payload,
      left.schema(leftTime).dataType, right.schema(rightTime).dataType, tolerance)
  }

  /** Forward (earliest-at-or-after) as-of join: for every left row,
    * the payload of the right row with the SMALLEST `rightTime` >= the
    * left row's `leftTime` in the same key group (pandas `merge_asof`
    * `direction='forward'`; DuckDB `ASOF JOIN ... ON l.t <= r.t`).
    * Same single-shuffle merge plan as [[asofBackward]], sorted
    * descending; inclusive at equal timestamps; `tolerance` bounds how
    * far in the FUTURE the match may be.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val (unioned, leftCols, _) = asofUnion(left, right, keys, leftTime, rightTime, payload)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").desc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .withColumn("__asof_row", last(col("__asof_row"), ignoreNulls = true).over(w))
    asofFinish(filled, leftCols, payload,
      left.schema(leftTime).dataType, right.schema(rightTime).dataType, tolerance,
      forward = true)
  }

  /** Nearest as-of join: the right row minimizing |rightTime −
    * leftTime| within the key group; ties (equidistant before/after)
    * go to the BACKWARD candidate (pandas `direction='nearest'` with
    * deterministic tie-break). Both directional fills run in the same
    * single shuffle — two sorts over one exchange — then the closer
    * in-tolerance candidate wins per row.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val (unioned, leftCols, rowType) = asofUnion(left, right, keys, leftTime, rightTime, payload)
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").desc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__asof_bwd", last(col("__asof_row"), ignoreNulls = true).over(wB))
      .withColumn("__asof_fwd", last(col("__asof_row"), ignoreNulls = true).over(wF))

    val lts = epochFine(col("__asof_ts"), left.schema(leftTime).dataType, "leftTime")
    def rts(c: String) = epochFine(col(c).getField("__rts"),
      right.schema(rightTime).dataType, "rightTime")
    val bDist = lts - rts("__asof_bwd")
    val fDist = rts("__asof_fwd") - lts
    val bound = tolerance.map(t => lit(t.toDouble)).getOrElse(lit(Double.MaxValue))
    val bOk = col("__asof_bwd").isNotNull && bDist <= bound
    val fOk = col("__asof_fwd").isNotNull && fDist <= bound
    // Null-time left rows are explicitly unmatched (the null distances
    // would fall through anyway, but make the rule visible).
    val chosen = when(col("__asof_ts").isNull, lit(null).cast(rowType))
      .when(bOk && (!fOk || bDist <= fDist), col("__asof_bwd"))
      .when(fOk, col("__asof_fwd"))
      .otherwise(lit(null).cast(rowType))

    filled
      .filter(col("__asof_side") === 1)
      .withColumn("__asof_row", chosen)
      .select(leftCols.map(col) ++ payload.map(c =>
        col("__asof_row").getField(c).as(c)): _*)
  }

  /** [[asofBackward]] with bounded window tasks for skewed keys.
    *
    * Identical semantics; different plan. Time is cut into
    * `sliceSeconds` slices and the single per-key window becomes:
    *
    *  1. a per-(key, slice) window — every task bounded by the rows one
    *     key produces in one slice, so a hot key spreads over
    *     timespan/sliceSeconds tasks instead of serializing into one;
    *  2. a per-key carry of each slice's LAST right row across slice
    *     boundaries — this window sees one row per (key, slice), orders
    *     of magnitude smaller than the data;
    *  3. an equi-join of the carry back on (key, slice), then
    *     `coalesce(local, carried)`.
    *
    * Pick `sliceSeconds` so a hot key's rows-per-slice fit a task
    * comfortably (e.g. hottest key at ~10⁹ rows/year → hourly slices ≈
    * 10⁵ rows/task). Use plain [[asofBackward]] when per-key volumes
    * are bounded — it is one shuffle cheaper.
    */
  def asofBackwardSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      sliceSeconds: Long,
      tolerance: Option[Long] = None): DataFrame = {
    require(sliceSeconds > 0, "sliceSeconds must be positive")
    val (u0, leftCols, _) = asofUnion(left, right, keys, leftTime, rightTime, payload)

    val u = u0.withColumn("__slice",
      floor(epochSeconds(col("__asof_ts"), u0.schema("__asof_ts").dataType, "time") /
        sliceSeconds))
    val sliceKeys = (keys :+ "__slice").map(col)

    val wLocal = Window.partitionBy(sliceKeys: _*)
      .orderBy(col("__asof_ts").asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("__asof_row",
      last(col("__asof_row"), ignoreNulls = true).over(wLocal))

    // Last right row of every slice, carried forward across slices —
    // strictly-before frame: rows in slice s already saw s's own right
    // rows up to their own timestamp in the local pass.
    val sliceFinal = u.filter(col("__asof_side") === 0)
      .groupBy(sliceKeys: _*)
      .agg(max_by(col("__asof_row"), col("__asof_ts")).as("__slice_final"))
    val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(col("__slice").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = u.select(sliceKeys: _*).distinct()
      .join(sliceFinal, keys :+ "__slice", "left")
      .withColumn("__carry", last(col("__slice_final"), ignoreNulls = true).over(wCarry))
      .select(sliceKeys :+ col("__carry"): _*)

    val filled = local.join(carry, keys :+ "__slice", "left")
      .withColumn("__asof_row", coalesce(col("__asof_row"), col("__carry")))
    asofFinish(filled, leftCols, payload,
      left.schema(leftTime).dataType, right.schema(rightTime).dataType, tolerance)
  }

  /** Shared as-of validation + both-sides-in-one-frame layout: keys,
    * event time, side tag (right sorts before left at equal times →
    * inclusive match), left columns (nulled on right rows), and the
    * candidate right row as one `__asof_row` struct (nulled on left
    * rows).
    *
    * NULL-time rows: a right row with a null `rightTime` has no defined
    * position on the time axis and is EXCLUDED here (it would otherwise
    * sort first under asc-nulls-first and become a universal backward
    * match that the tolerance filter cannot reject — null staleness
    * distance falls through `when` to "keep"). A left row with a null
    * `leftTime` passes through UNMATCHED (null payload, left-outer
    * semantics) — enforced in [[asofFinish]] / [[asofNearest]]'s
    * projection rather than by dropping the row.
    */
  private def asofUnion(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): (DataFrame, Seq[String], StructType) = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    requireCols(left, keys :+ leftTime, "left")
    requireCols(right, (keys :+ rightTime) ++ payload, "right")
    checkTimeType(left.schema(leftTime).dataType, "leftTime")
    checkTimeType(right.schema(rightTime).dataType, "rightTime")
    // The two time columns union into ONE __asof_ts column; mixed type
    // classes (e.g. timestamp left + string right) would silently
    // coerce and then break the epoch math, so reject them eagerly.
    requireSameTimeClass(
      left.schema(leftTime).dataType -> "leftTime",
      right.schema(rightTime).dataType -> "rightTime")
    val leftCols = left.columns.toSeq
    val reserved = Seq("__asof_ts", "__asof_side", "__asof_row", "__asof_bwd",
      "__asof_fwd", "__rts", "__slice", "__slice_final", "__carry")
    require(!leftCols.exists(reserved.contains),
      s"left reserves column name(s) ${reserved.mkString(", ")}")
    require(!payload.exists(reserved.contains),
      s"payload reserves column name(s) ${reserved.mkString(", ")}")
    val clash = payload.filter(leftCols.contains)
    require(clash.isEmpty,
      s"payload column(s) ${clash.mkString(", ")} collide with left columns; alias them first")

    // The matched right row travels as one atomic struct (payload
    // fields + its own timestamp for the staleness check).
    val rowType = StructType(
      payload.map(c => StructField(c, right.schema(c).dataType)) :+
        StructField("__rts", right.schema(rightTime).dataType))
    val leftPart = left.select(
      (keys.map(col) :+ col(leftTime).as("__asof_ts") :+ lit(1).as("__asof_side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(rowType).as("__asof_row"): _*)
    val rightPart = right.filter(col(rightTime).isNotNull).select(
      (keys.map(col) :+ col(rightTime).as("__asof_ts") :+ lit(0).as("__asof_side")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col) :+ col(rightTime).as("__rts"): _*).cast(rowType)
          .as("__asof_row"): _*)
    (leftPart.unionByName(rightPart), leftCols, rowType)
  }

  /** Staleness filter + final projection shared by the directional
    * as-of plans. Tolerance math uses fractional epochs ([[epochFine]])
    * so it agrees with a fractional-`epoch()` oracle engine near the
    * threshold.
    */
  private def asofFinish(
      filled: DataFrame,
      leftCols: Seq[String],
      payload: Seq[String],
      leftTimeType: DataType,
      rightTimeType: DataType,
      tolerance: Option[Long],
      forward: Boolean = false): DataFrame = {
    val stale: Column = tolerance match {
      case Some(sec) =>
        val lts = epochFine(col("__asof_ts"), leftTimeType, "leftTime")
        val rts = epochFine(col("__asof_row").getField("__rts"),
          rightTimeType, "rightTime")
        val dist = if (forward) rts - lts else lts - rts
        col("__asof_row").isNull || dist > sec.toDouble
      case None => lit(false)
    }
    // A null-time left row has no position on the time axis: whatever
    // the window carried to it (e.g. under desc ordering nulls sort
    // last and would see every right row) is meaningless — always
    // unmatched.
    val noTime = col("__asof_ts").isNull
    filled
      .filter(col("__asof_side") === 1)
      .select(leftCols.map(col) ++ payload.map(c =>
        when(stale || noTime, lit(null)).otherwise(col("__asof_row").getField(c)).as(c)): _*)
  }

  /** Interval-overlap join: pairs every `a` interval with every `b`
    * interval of the same key that overlaps it. Intervals are CLOSED —
    * touching endpoints count (`aStart <= bEnd && bStart <= aEnd`).
    * Rows whose end precedes their start are empty intervals and match
    * nothing.
    *
    * Both sides explode over their bins; the pair is emitted only in
    * the FIRST bin the two intervals share — `max(aStartBin,
    * bStartBin)`, which the overlap predicate guarantees lies in both
    * bin ranges — so each qualifying pair appears exactly once with no
    * post-join distinct. Same scale shape as [[pointsInIntervals]]:
    * the range predicate becomes a hash-join key, never a nested loop.
    */
  def intervalsOverlap(
      a: DataFrame,
      b: DataFrame,
      keys: Seq[String],
      aStart: String,
      aEnd: String,
      bStart: String,
      bEnd: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(keys.nonEmpty, "overlap join needs at least one key column")
    requireCols(a, keys ++ Seq(aStart, aEnd), "a")
    requireCols(b, keys ++ Seq(bStart, bEnd), "b")
    Seq(aStart -> "aStart", aEnd -> "aEnd").foreach { case (c, w) =>
      checkTimeType(a.schema(c).dataType, w) }
    Seq(bStart -> "bStart", bEnd -> "bEnd").foreach { case (c, w) =>
      checkTimeType(b.schema(c).dataType, w) }
    requireSameTimeClass(
      a.schema(aStart).dataType -> "aStart", a.schema(aEnd).dataType -> "aEnd",
      b.schema(bStart).dataType -> "bStart", b.schema(bEnd).dataType -> "bEnd")
    val renamed = keys.map(k => s"__p_$k") ++ Seq("__p_sbin", "__p_bin")
    val allNames = a.columns.toSeq ++ b.columns
    require(!Seq("__bin", "__sbin").exists(allNames.contains) &&
      !renamed.exists(allNames.contains),
      "reserved column name collision (__bin / __sbin / __p_*)")
    val shared = a.columns.toSeq.intersect(b.columns.toSeq.filterNot(keys.contains))
    require(shared.isEmpty,
      s"non-key column(s) ${shared.mkString(", ")} exist on both sides; alias them first")

    def binned(df: DataFrame, start: String, end: String): DataFrame = {
      val s = epochSeconds(col(start), df.schema(start).dataType, start)
      val e = epochSeconds(col(end), df.schema(end).dataType, end)
      df.filter(col(end) >= col(start))
        .withColumn("__sbin", floor(s / binSeconds))
        .withColumn("__bin", explode(sequence(col("__sbin"), floor(e / binSeconds))))
    }
    val aB = binned(a, aStart, aEnd)
    val bB = binned(b, bStart, bEnd)
      .withColumnsRenamed(
        (keys.map(k => k -> s"__p_$k") ++ Seq("__sbin" -> "__p_sbin", "__bin" -> "__p_bin")).toMap)

    val joined = aB.join(bB,
      keys.map(k => aB(k) === bB(s"__p_$k")).reduce(_ && _) &&
        aB("__bin") === bB("__p_bin") &&
        aB("__bin") === greatest(aB("__sbin"), bB("__p_sbin")) &&
        aB(aStart) <= bB(bEnd) && bB(bStart) <= aB(aEnd))
    val dropped = joined
      .drop(aB("__bin")).drop(aB("__sbin")).drop(bB("__p_bin")).drop(bB("__p_sbin"))
    keys.foldLeft(dropped)((df, k) => df.drop(bB(s"__p_$k")))
  }

  /** Point-in-interval range join: pairs every point with every
    * interval of the same key that contains it (half-open: `start <
    * t <= end`).
    *
    * Intervals are exploded over the fixed-width time buckets they
    * cover; points land in exactly one bucket, so each qualifying
    * (interval, point) pair is produced exactly once — no post-join
    * dedup. The bucket column turns the range predicate into a
    * hash-join key; pick `binSeconds` ≈ the typical interval width so
    * the explosion factor stays ~2. Intervals much longer than the bin
    * width multiply their row count by width/binSeconds — clamp the
    * bin up (or pre-split pathological intervals) before calling.
    *
    * Inverted intervals (`end < start`) match nothing and are filtered
    * out BEFORE binning, same as [[intervalsOverlap]]: Spark's
    * `sequence(start, stop)` with start > stop generates a DESCENDING
    * sequence, so one dirty row (end = 0 sentinel against an epoch
    * start) would otherwise explode into millions of bin rows.
    */
  def pointsInIntervals(
      intervals: DataFrame,
      points: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      timeCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(keys.nonEmpty, "range join needs at least one key column")
    requireCols(intervals, keys ++ Seq(startCol, endCol), "intervals")
    requireCols(points, keys :+ timeCol, "points")
    checkTimeType(intervals.schema(startCol).dataType, "startCol")
    checkTimeType(intervals.schema(endCol).dataType, "endCol")
    checkTimeType(points.schema(timeCol).dataType, "timeCol")
    requireSameTimeClass(
      intervals.schema(startCol).dataType -> "startCol",
      intervals.schema(endCol).dataType -> "endCol",
      points.schema(timeCol).dataType -> "timeCol")
    val renamed = keys.map(k => s"__p_$k")
    val allNames = intervals.columns.toSeq ++ points.columns
    require(!allNames.contains("__bin") && !renamed.exists(allNames.contains),
      "reserved column name collision (__bin / __p_<key>)")
    val shared = intervals.columns.toSeq.intersect(
      points.columns.toSeq.filterNot(keys.contains))
    require(shared.isEmpty,
      s"non-key column(s) ${shared.mkString(", ")} exist on both sides; alias them first")

    val sEpoch = epochSeconds(col(startCol), intervals.schema(startCol).dataType, "startCol")
    val eEpoch = epochSeconds(col(endCol), intervals.schema(endCol).dataType, "endCol")
    val binned = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bin",
        explode(sequence(floor(sEpoch / binSeconds), floor(eEpoch / binSeconds))))
    val pts = points
      .withColumn("__bin",
        floor(epochSeconds(col(timeCol), points.schema(timeCol).dataType, "timeCol") / binSeconds))
      .withColumnsRenamed(keys.map(k => k -> s"__p_$k").toMap)
    val joined = binned.join(pts,
      keys.map(k => binned(k) === pts(s"__p_$k")).reduce(_ && _) &&
        binned("__bin") === pts("__bin") &&
        pts(timeCol) > binned(startCol) && pts(timeCol) <= binned(endCol))
    keys.foldLeft(joined.drop(binned("__bin")).drop(pts("__bin"))) {
      (df, k) => df.drop(pts(s"__p_$k"))
    }
  }
}
