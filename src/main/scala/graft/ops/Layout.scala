package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage-layout operators: bucketed ingest for shuffle-free joins.
  *
  * At 100 TB the dominant cost of a fact-fact join is the exchange —
  * both sides hash-shuffled on the key every time the join runs.
  * Bucketing moves that cost to INGEST: the table is written
  * pre-hash-partitioned (and optionally pre-sorted) on the join key,
  * so every subsequent join or aggregation on that key reads the
  * co-located buckets and skips the exchange (and with matching
  * `sortBy`, the sort) — pay once, join forever. This is the batch
  * twin of [[graft.ops.ZOrder]]'s read-locality story and the same
  * trade Hive/Trino bucketed tables and Iceberg bucket transforms
  * make.
  *
  * Bucket count guidance: pick `buckets` so one bucket of the LARGER
  * table ≈ one comfortable task (128–512 MB); both sides of a
  * co-located join must use the SAME bucket count and key.
  */
object Layout {

  /** Write `df` as a bucketed external table at `path`, registered as
    * `table`. Buckets (and in-bucket sort, when `sortCols` is given)
    * are on `keys` — subsequent equi-joins/aggregations on `keys`
    * between tables bucketed alike run exchange-free.
    */
  def ingestBucketed(df: DataFrame, table: String, path: String,
      keys: Seq[String], buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "bucketed ingest needs at least one key column")
    require(buckets > 0, "buckets must be positive")
    val w = df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** The bucketed table back as a DataFrame (scan reports the bucket
    * hash partitioning to Catalyst — that is what elides exchanges).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Compact a parquet dataset into ~`targetBytes`-sized files — the
    * small-files remedy. Streaming sinks, per-partition writers, and
    * incremental ingests leave thousands of KB-scale files; at 100 TB
    * that is millions of scan tasks and a listing-dominated planner.
    * One coalesce-write (sized from the dataset's actual on-disk
    * bytes) restores healthy splits.
    *
    * `coalesce` when shrinking (the compaction regime — NO shuffle,
    * each output task concatenates a handful of input files);
    * `repartition` when the computed target EXCEEDS the scan's
    * partition count (e.g. `targetBytes` below
    * `spark.sql.files.maxPartitionBytes`) — coalesce cannot increase
    * partitions, so it would silently write fewer, larger files than
    * requested while this method reported the larger number. Returns
    * the file count actually written.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 256L << 20): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    // Size from the DATA files only: getContentSummary of the whole
    // directory also counts _SUCCESS, checksum files and leftover
    // _temporary artifacts, inflating the plan. Same visibility rule
    // as the parquet scan itself (skip _-/.-prefixed entries).
    def dataBytes(p: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(p).iterator.map { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) 0L
        else if (st.isDirectory) dataBytes(st.getPath)
        else st.getLen
      }.sum
    val totalBytes = dataBytes(new org.apache.hadoop.fs.Path(inPath))
    val files = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val src = spark.read.parquet(inPath)
    val scanParts = src.rdd.getNumPartitions
    val sized =
      if (files <= scanParts) src.coalesce(files)
      else src.repartition(files)
    sized.write.mode(SaveMode.Overwrite).parquet(outPath)
    // Report what was actually WRITTEN (empty upstream partitions can
    // produce fewer part files than planned), not the planned target —
    // callers verify compaction against this number.
    val outFs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outPath), spark.sparkContext.hadoopConfiguration)
    outFs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
  }
}
