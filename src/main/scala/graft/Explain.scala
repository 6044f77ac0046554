package graft
import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one harness query — the plan
  * audit loop (are filters pushed, joins broadcast, codegen spans
  * wide?). Usage: runMain graft.Explain <query> [sfDir].
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <query> [sfDir]")
    require(SparkEntry.queries.contains(args(0)),
      s"unknown query '${args(0)}'; available:\n  " +
        SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    println(s"[explain] === ${args(0)} ===")
    df.explain("formatted")
    spark.stop()
  }
}
