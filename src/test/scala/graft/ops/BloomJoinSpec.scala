package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every truly-matching fact row survives the prune") {
    val fact = spark.range(0, 10000).select(col("id").as("k"))
    val dim = spark.range(0, 10000, 7).select(col("id").as("dk"))
    val pruned = BloomJoin.pruneLarge(fact, "k", dim, "dk", expectedItems = 2000)
      .as[Long].collect().toSet
    val truth = (0L until 10000L by 7).toSet
    assert(truth.subsetOf(pruned), "bloom pruning must never drop a real match")
  }

  test("false positive rate stays near the requested fpp") {
    val fact = spark.range(0, 50000).select(col("id").as("k"))
    val dim = spark.range(0, 50000, 50).select(col("id").as("dk")) // 1000 keys
    val pruned = BloomJoin.pruneLarge(fact, "k", dim, "dk",
      expectedItems = 1000, fpp = 0.01).count()
    val real = 1000L
    val falsePos = pruned - real
    val nonMatching = 50000L - real
    assert(falsePos >= 0)
    assert(falsePos.toDouble / nonMatching < 0.05,
      s"fp rate ${falsePos.toDouble / nonMatching} far above requested 0.01")
  }

  test("null fact keys are pruned (inner-join semantics)") {
    val fact = Seq(Some(1L), None, Some(2L)).toDF("k")
    val dim = Seq(1L, 2L).toDF("dk")
    val pruned = BloomJoin.pruneLarge(fact, "k", dim, "dk", expectedItems = 10)
    assert(pruned.count() === 2)
  }

  test("the prune is a scan-local filter: no shuffle, probe inside codegen") {
    val fact = spark.range(0, 100).select(col("id").as("k"))
    val dim = spark.range(0, 10).select(col("id").as("dk"))
    val pruned = BloomJoin.pruneLarge(fact, "k", dim, "dk", expectedItems = 10)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"prune must not shuffle, plan:\n$plan")
    assert(plan.toLowerCase.contains("might_contain"),
      s"expected bloom probe in plan:\n$plan")
    // "*(n)" marks WholeStageCodegen stages in the compact plan string.
    assert(plan.contains("*(1) Filter"), s"probe should be codegen'd:\n$plan")
  }
}
