package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** The events table's `ts` physical type has varied across data
    * generations; normalize every variant to a session-zone
    * TimestampType so downstream `unix_micros` algebra is stable:
    *
    *  - TIMESTAMP(NANOS): requires
    *    spark.sql.legacy.parquet.nanosAsLong=true (the vectorized
    *    reader otherwise rejects it); the nanos arrive as LongType and
    *    are divided down to micros (integer division — a double
    *    division would lose precision above 2^53 ns);
    *  - timestamp[us] with isAdjustedToUTC=false: Spark 4 infers
    *    TIMESTAMP_NTZ (spark.sql.parquet.inferTimestampNTZ.enabled
    *    defaults true); cast to TimestampType — all sessions here pin
    *    spark.sql.session.timeZone=UTC, so the instant is unchanged
    *    and matches what a naive-timestamp oracle engine reads.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // the NTZ→LTZ cast reads the SESSION zone; in any zone but UTC
        // every instant would silently shift by the local offset, so
        // fail loudly instead (the nanos-long path above is
        // zone-independent and never needed this guard)
        val tz = spark.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ; loading it requires spark.sql.session.timeZone=UTC " +
            s"(got '$tz') so naive timestamps keep their instants")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    } else df
  }
}
