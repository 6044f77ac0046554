package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("centroids equal the explode formulation") {
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 4.0f)),
      (1, Seq(-1.0f, 0.5f))).toDF("label", "embedding")
    val got = VectorAgg.centroids(df, "label", "embedding")
      .select(col("label"), col("centroid"))
      .as[(String, Seq[Double])].collect().toMap
    assert(got("0") === Seq(2.0, 3.0))
    assert(got("1") === Seq(-1.0, 0.5))
  }

  test("null and empty vectors are skipped; all-null group yields empty centroid") {
    val df = Seq(
      (0, Seq(2.0f, 6.0f)), (0, null), (1, null), (1, Seq.empty[Float]))
      .toDF("label", "embedding")
    val got = VectorAgg.centroids(df, "label", "embedding")
      .as[(String, Seq[Double])].collect().toMap
    assert(got("0") === Seq(2.0, 6.0))
    assert(got("1") === Seq.empty)
  }

  test("a null ELEMENT inside a vector is skipped like a null vector, not an encoder crash") {
    val df = Seq(
      ("g", Seq[java.lang.Double](1.0, 2.0)),
      ("g", Seq[java.lang.Double](3.0, null)), // failed embedding — skip
      ("h", Seq[java.lang.Double](null)))
      .toDF("g", "embedding")
    val out = VectorAgg.centroids(df, "g", "embedding")
      .as[(String, Seq[Double])].collect().toMap
    assert(out("g") == Seq(1.0, 2.0)) // only the clean vector counts
    assert(out("h") == Seq.empty)     // all vectors bad → empty centroid
  }

  test("mixed vector widths in one group fail loudly") {
    val df = Seq((0, Seq(1.0f)), (0, Seq(1.0f, 2.0f))).toDF("label", "embedding")
    val e = intercept[Exception](VectorAgg.centroids(df, "label", "embedding").collect())
    assert(e.getMessage != null)
  }

  test("plan is a bounded object aggregate — no explode/generate of the input") {
    val df = Seq((0, Seq(1.0f, 2.0f))).toDF("label", "embedding")
    val plan = VectorAgg.centroids(df, "label", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an object aggregate, plan:\n$plan")
    assert(!plan.contains("Generate"), s"input must not be exploded, plan:\n$plan")
  }
}
