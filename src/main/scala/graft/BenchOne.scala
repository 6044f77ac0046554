package graft
import org.apache.spark.sql.SparkSession

/** Time ONE harness query repeatedly — the iteration loop for plan
  * work (Bench runs all queries; this isolates the one under the
  * knife). Usage: runMain graft.BenchOne <query> [sfDir] [runs].
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <query> [sfDir] [runs]")
    val name = args(0)
    // Validate BEFORE the session spins up — a typo'd name should die
    // with the available names, not a NoSuchElementException after 10 s
    // of Spark startup.
    require(SparkEntry.queries.contains(name),
      s"unknown query '$name'; available:\n  " +
        SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      // Same cache honesty as Bench: drop CacheManager entries so each
      // run is one cold end-to-end execution (a persist-bearing query
      // would otherwise time warm from run 2 on).
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // noop sink, same action as Bench: count() lets Catalyst prune
      // columns and whole join subtrees, so it can time a fraction of
      // the real query (guide §1.4; the dedup family measured 0.6 s
      // under count() vs ~40 s real at sf10).
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[benchone] run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
