package graft.load

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing evidence for the 100 TB stance: two tables bucketed on the
  * join key co-locate — the sort-merge join runs WITHOUT a shuffle
  * exchange on either side. This is the ingest-time layout choice that
  * turns the repeated fact-fact joins (lineitem ⋈ orders at every query)
  * from a per-query shuffle into a free co-partitioned merge.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("bucketwh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = "/root/testdata/sf0.001"
      Tables.load(spark, dir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li").saveAsTable("li_bucketed")
      Tables.load(spark, dir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/ord").saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // the only exchange allowed is the aggregation's, never the join's:
      val joinSection = plan.substring(0, plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.split("SortMergeJoin")(1).contains("Exchange hashpartitioning"),
        s"join must not shuffle bucketed sides:\n$plan")

      // and the result matches the unbucketed join
      val expected = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
        expected.collect().map(r => (r.getString(0), r.getLong(1))).toMap)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
