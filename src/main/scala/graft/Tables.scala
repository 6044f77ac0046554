package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory at call time so the same
  * code runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench).
  * At cluster scale these would be external tables; nothing below assumes
  * a single file per table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions must set spark.sql.legacy.parquet.nanosAsLong=true: the
    * events table carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader otherwise rejects; the nanos arrive as LongType and are
    * normalized here to a microsecond TimestampType (integer division —
    * a double division would lose precision above 2^53 ns).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}
