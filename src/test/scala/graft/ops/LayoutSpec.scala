package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_layout_$name").toString

  test("co-bucketed join runs without any exchange and matches the plain join") {
    val left = spark.range(0, 10000).select(col("id").as("k"),
      (col("id") % 7).as("a"))
    val right = spark.range(0, 10000, 3).select(col("id").as("k"),
      (col("id") % 5).as("b"))
    Layout.ingestBucketed(left, "bkt_l", tmp("l"), Seq("k"), 4, sortCols = Seq("k"))
    Layout.ingestBucketed(right, "bkt_r", tmp("r"), Seq("k"), 4, sortCols = Seq("k"))

    val bl = Layout.readBucketed(spark, "bkt_l")
    val br = Layout.readBucketed(spark, "bkt_r")
    // force a non-broadcast join so the exchange WOULD appear without bucketing
    val j = bl.join(br.hint("merge"), Seq("k"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"co-bucketed merge join must not shuffle:\n$plan")

    val expected = left.join(right, Seq("k"))
      .select("k", "a", "b").as[(Long, Long, Long)].collect().toSet
    assert(j.select("k", "a", "b").as[(Long, Long, Long)].collect().toSet == expected)
  }

  test("aggregation on the bucket key is exchange-free") {
    val df = spark.range(0, 5000).select(col("id").as("k"), lit(1L).as("v"))
    Layout.ingestBucketed(df, "bkt_agg", tmp("agg"), Seq("k"), 4)
    val agg = Layout.readBucketed(spark, "bkt_agg").groupBy("k").agg(sum("v"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"groupBy on the bucket key must not shuffle:\n$plan")
    assert(agg.count() == 5000L)
  }

  test("compact merges a many-small-files dataset without losing rows") {
    val in = tmp("compact_in")
    val out = tmp("compact_out")
    // 64 partitions of a small range → 64 tiny files
    spark.range(0, 10000).repartition(64).write.mode("overwrite").parquet(in)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in) == 64)

    val planned = Layout.compact(spark, in, out, targetBytes = 1L << 30)
    assert(planned == 1)
    assert(parquetFiles(out) == 1)
    assert(spark.read.parquet(out).count() == 10000L)
  }

  test("ORC sink/scan round-trips and pushes filters to the ORC reader") {
    val p = tmp("orc")
    val df = (1 to 2000).map(i => (i.toLong, s"name$i", i % 13)).toDF("id", "name", "grp")
    df.write.mode("overwrite").orc(p)
    val back = spark.read.orc(p)
    assert(back.count() == 2000L)
    assert(back.filter(col("grp") === 5).count() ==
      df.filter(col("grp") === 5).count())
    // the predicate must reach the ORC scan, same as the parquet paths
    val plan = back.filter(col("grp") === 5).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(grp,5)"), plan)
  }

  test("join on a NON-bucket key still shuffles (the layout is key-specific)") {
    val df = spark.range(0, 1000).select(col("id").as("k"), (col("id") % 10).as("other"))
    Layout.ingestBucketed(df, "bkt_k", tmp("k"), Seq("k"), 4)
    val t = Layout.readBucketed(spark, "bkt_k")
    val j = t.as("x").join(t.as("y").hint("merge"), col("x.other") === col("y.other"))
    assert(j.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
