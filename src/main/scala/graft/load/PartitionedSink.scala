package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out table sinks: how 100 TB outputs should land on storage.
  *
  * - `writePartitioned`: hive-style directory partitioning on a
  *   low-cardinality column — readers with a partition predicate scan
  *   only matching directories (partition pruning, asserted in
  *   `PartitionedSinkSpec`), and `maxRecordsPerFile` bounds file sizes.
  * - `writeClustered`: sorts within partitions by the given columns
  *   before writing so min/max footer stats make row-group skipping
  *   effective for range predicates on those columns.
  */
object PartitionedSink {

  def writePartitioned(df: DataFrame, outDir: String, partitionCol: String,
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(outDir)

  def writeClustered(df: DataFrame, outDir: String, sortCols: Seq[String]): Unit =
    df.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(outDir)

  def read(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(dir)
}
