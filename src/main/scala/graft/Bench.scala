package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup pass over every query: JIT, whole-stage-codegen
    // compilation, file-index and shuffle-service caches. The timed
    // pass then measures steady-state execution, not session startup.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // A crashed query must be visibly failed in the JSON, never an
    // innocuous-looking elapsed time: its per-query value is null and
    // it is listed under "failed".
    //
    // Each query is timed as the MEDIAN of `passes` runs (default 3):
    // a single contention burst on a shared box then pollutes at most
    // one pass, not the committed artifact. Failure semantics stay
    // per-pass — the median is taken over successful passes only, and
    // a query is "failed" only when every pass failed.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to passes).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      if (times.isEmpty) (name, 0.0, false)
      else {
        val s = times.sorted
        (name, s(s.length / 2), true)
      }
    }
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) v.toString else "null")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // "failed"/"value" (the total) go LAST on the line: the driver
    // archives only the final 2000 chars of stdout, so trailing keys
    // survive truncation even when the per-query map outgrows it.
    val line = s"""{"metric":"total","unit":"sec","sf":"$sfDir","queries":$qs,"failed":$failed,"value":$total}"""
    println(line)
    // The stdout tail loses the head of the per-query map once it
    // outgrows 2000 chars, so the COMPLETE line is also written to a
    // committed repo file — the durable evidence the truncated
    // artifact can't carry.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: java.io.IOException => () } // read-only CWD: stdout still has the line
    spark.stop()
  }
}
