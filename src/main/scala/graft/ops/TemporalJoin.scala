package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * sorts first at equal timestamps.
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
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("__asof_ts") && !leftCols.contains("__asof_side"),
      "reserved column name collision")

    // Common layout: keys, event time, side tag (right sorts before
    // left at equal times → inclusive match), left payload, right
    // payload. Each side nulls the other's columns.
    val leftPart = left.select(
      (keys.map(col) :+ col(leftTime).as("__asof_ts") :+ lit(1).as("__asof_side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        (payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
          lit(null).cast(right.schema(rightTime).dataType).as("__asof_rts")): _*)
    val rightPart = right.select(
      (keys.map(col) :+ col(rightTime).as("__asof_ts") :+ lit(0).as("__asof_side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        (payload.map(col) :+ col(rightTime).as("__asof_rts")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = (payload :+ "__asof_rts").foldLeft(leftPart.unionByName(rightPart)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val stale: Column = tolerance match {
      case Some(sec) =>
        col("__asof_rts").isNull ||
          unix_timestamp(col("__asof_ts")) - unix_timestamp(col("__asof_rts")) > sec
      case None => lit(false)
    }
    filled
      .filter(col("__asof_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => when(stale, lit(null)).otherwise(col(c)).as(c)): _*)
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
    * the explosion factor stays ~2.
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
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / binSeconds),
        floor(unix_timestamp(col(endCol)) / binSeconds))))
    val pts = points
      .withColumn("__bin", floor(unix_timestamp(col(timeCol)) / binSeconds))
      .withColumnsRenamed(keys.map(k => k -> s"__p_$k").toMap)
    binned
      .join(pts,
        keys.map(k => col(k) === col(s"__p_$k")).reduce(_ && _) &&
          binned("__bin") === pts("__bin") &&
          col(timeCol) > col(startCol) && col(timeCol) <= col(endCol))
      .drop("__bin", keys.map(k => s"__p_$k"): _*)
  }
}
