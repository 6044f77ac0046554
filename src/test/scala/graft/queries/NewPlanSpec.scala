package graft.queries

import graft.SparkSpec
import graft.ops.{Dedup, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Plan-shape assertions for the round-2 operators — CI-checked, not
  * hoped for (same stance as PlanSpec).
  */
class NewPlanSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) = (0 until n).map { i =>
    (i.toLong, (0 until 8).map(d => math.sin(i * 0.3 + d).toFloat).toArray)
  }.toDF("vec_id", "embedding")

  // AQE wraps plans until stages materialize; these shape assertions
  // read the statically-compiled plan (PlanSpec precedent).
  private def withoutAqe[A](body: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("embedding near-dup LSH: candidate dedup shuffles scores, never vectors") {
    withoutAqe {
      val lsh = Similarity.embeddingNearDupLsh(vecs(300), "vec_id", "embedding",
        0.9, bits = 8, tables = 4)
      val physical = lsh.queryExecution.executedPlan.toString
      // the dedup aggregate must be a hash aggregate over the narrow
      // (ids, score) rows — a first()-over-arrays SortAggregate means
      // vector payloads are riding the shuffle
      assert(physical.contains("HashAggregate"), physical)
      assert(!physical.contains("first(__v"),
        s"vector payloads must not pass through the dedup shuffle:\n$physical")
    }
  }

  test("hash sampling is a pure pushable filter (no shuffle, no UDF)") {
    val df = vecs(100).select(col("vec_id").as("doc_id"))
    val plan = Sampling.hashSample(df, "doc_id", 0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUDF"))
  }

  test("native vec_dot keeps brute-force scoring inside WholeStageCodegen") {
    val df = vecs(200)
    val q = df.filter($"vec_id" < 2)
    withoutAqe {
      val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5)
      val codegen = brute.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(codegen.contains("WholeStageCodegen"), codegen.take(2000))
      assert(codegen.contains("vec_dot"), codegen.take(2000))
      // and the generated source actually inlines the primitive loop
      assert(codegen.contains("numElements"), codegen.take(2000))
    }
  }
}
