package graft.load

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PartitionedSinkSpec extends SparkSpec {

  test("partitioned write + partition pruning on read-back") {
    val out = java.nio.file.Files.createTempDirectory("psink").toString
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    PartitionedSink.writePartitioned(li, out, "l_returnflag")

    // hive-style directories exist
    val dirs = new java.io.File(out).list().filter(_.startsWith("l_returnflag=")).sorted
    assert(dirs.length == 3)

    // a partition predicate prunes to one directory:
    val back = PartitionedSink.read(spark, out).filter(col("l_returnflag") === "R")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(back.count() ==
      li.filter(col("l_returnflag") === "R").count())
    // the scan's selected partition count is 1 of 3
    val optimized = back.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("l_returnflag=A"))
  }

  test("clustered write keeps row-group stats useful (round-trips data)") {
    val out = java.nio.file.Files.createTempDirectory("csink").toString
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    PartitionedSink.writeClustered(li, out, Seq("l_shipdate"))
    val back = PartitionedSink.read(spark, out)
    assert(back.count() == li.count())
    assert(back.agg(sum(col("l_quantity"))).head().getDouble(0) ==
      li.agg(sum(col("l_quantity"))).head().getDouble(0))
  }
}
