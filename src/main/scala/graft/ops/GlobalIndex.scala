package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Contiguous global row numbering at scale.
  *
  * `row_number() OVER (ORDER BY ...)` with no partition clause moves
  * the ENTIRE dataset through one window task — the canonical
  * 100 TB scale-killer (Spark itself warns "Moving all data to a
  * single partition"). `monotonically_increasing_id` is parallel but
  * neither contiguous nor ordering-aligned. This op produces exactly
  * the `row_number` result with bounded tasks:
  *
  *  1. range-repartition by the sort key and sort within partitions —
  *     one shuffle, the same work ANY global ordering costs;
  *  2. a metadata job: per-partition row counts (map-side-combined to
  *     one row per partition, so the "collect" moves numPartitions
  *     longs — partitioning metadata, not data; `RDD.zipWithIndex`
  *     runs the identical extra job internally);
  *  3. cumulative offsets broadcast; each partition then streams its
  *     rows through a local counter (`mapPartitions` — genuine
  *     per-partition imperative logic, no extra shuffle; the window
  *     formulation over a partition-id column would re-exchange the
  *     full dataset a second time just to prove co-location Catalyst
  *     already has).
  *
  * The input is pinned with MEMORY_AND_DISK persistence between the
  * count job and the indexing pass so both see the same physical
  * partitioning; callers streaming truly huge inputs can instead
  * write the range-sorted data out and re-read it. Ties in `order`
  * make the index nondeterministic between tied rows (same as
  * `row_number`) — order by a unique key for reproducible ids.
  */
object GlobalIndex {

  /** `df` plus a contiguous 1-based `idxCol` numbering rows in
    * `order`. Output is range-sorted by `order` (partition i holds
    * lower ids than partition i+1, sorted within).
    *
    * The internal multi-pass cache is released when the context
    * cleaner garbage-collects the plan; long-lived sessions indexing
    * large inputs repeatedly should use [[withGlobalIndexManaged]] and
    * call the cleanup handle after materializing the result (disk-
    * backed cache blocks are not LRU-evicted, so they otherwise pin
    * storage until GC happens to run).
    */
  def withGlobalIndex(
      df: DataFrame,
      order: Seq[Column],
      idxCol: String = "row_idx",
      partitions: Option[Int] = None): DataFrame =
    withGlobalIndexManaged(df, order, idxCol, partitions)._1

  /** As [[withGlobalIndex]], plus a cleanup thunk that unpersists the
    * internal cache — call it once the result has been materialized
    * (written/collected); the cache must survive until then because the
    * count job and the indexing pass must observe the SAME physical
    * range partitioning.
    */
  def withGlobalIndexManaged(
      df: DataFrame,
      order: Seq[Column],
      idxCol: String = "row_idx",
      partitions: Option[Int] = None): (DataFrame, () => Unit) = {
    require(order.nonEmpty, "global index needs at least one ordering column")
    require(!df.columns.contains(idxCol),
      s"index column '$idxCol' already exists on the input")
    require(!df.columns.contains("__gi_pid"),
      "reserved column name collision (__gi_pid)")
    val spark = df.sparkSession
    val n = partitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    // The range-partition id is baked INTO the cached rows (not read
    // from TaskContext at indexing time): a downstream `coalesce` or
    // other narrow recomposition re-numbers tasks, but the materialized
    // pid column keeps naming the partition each row was range-sorted
    // into.
    val parted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__gi_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Count-job failures must unpersist: the cleanup thunk has not
    // been returned yet, so nothing else ever could (the
    // Binning.labeledPartition guard).
    val counts: Map[Int, Long] =
      try {
        parted
          .groupBy(col("__gi_pid"))
          .agg(count(lit(1)).as("__gi_cnt"))
          .collect()
          .map(r => r.getInt(0) -> r.getLong(1))
          .toMap
      } catch { case e: Throwable => parted.unpersist(); throw e }
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.keys.toSeq.sorted.map { p =>
        val off = acc; acc += counts(p); p -> off
      }.toMap
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    val pidIdx = parted.schema.fieldIndex("__gi_pid")
    val outSchema = df.schema.add(idxCol, LongType, nullable = false)
    val out = parted.mapPartitions { rows =>
      // One counter per pid seen in this task: a task normally streams
      // exactly one range partition, but after a coalesce it streams
      // several in sequence — each still internally sorted, so
      // per-pid counters stay exact.
      val counters = scala.collection.mutable.HashMap.empty[Int, Long]
      val offs = bcOffsets.value
      rows.map { r =>
        val pid = r.getInt(pidIdx)
        // A pid absent from the count job means the cache drifted (a
        // lost block recomputed from a nondeterministic upstream):
        // falling back to offset 0 would silently duplicate partition
        // 0's id range. Fail loudly instead.
        val base = counters.get(pid).orElse(offs.get(pid)).getOrElse(
          throw new IllegalStateException(
            s"global index: range partition $pid holds rows but had none " +
              "during the count job — the cached partitioning drifted " +
              "(nondeterministic upstream recomputation?); re-run with a " +
              "deterministic input or materialize it first"))
        val i = base + 1
        counters(pid) = i
        val vals = r.toSeq
        Row.fromSeq(vals.take(pidIdx) ++ vals.drop(pidIdx + 1) :+ i)
      }
    }(Encoders.row(outSchema))
    (out, () => { parted.unpersist(); () })
  }
}
