package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator top-k equals the window formulation, ties broken deterministically") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 4000).map { i =>
      (Seq("a", "b", "c", "d")(i % 4), math.floor(rnd.nextDouble() * 40), i.toLong)
    }.toDF("g", "v", "tie")
    val agg = TopK.topKPerGroup(df, "g", "v", "tie", k = 5)
      .as[(String, Long, Double, Long)].collect().toSet
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"tie")
    val win = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"g", $"rank".cast("long"), $"v", $"tie")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(agg === win)
  }

  test("k larger than a group returns the whole group ranked; empty input returns nothing") {
    val df = Seq(("g", 2.0, 1L), ("g", 1.0, 2L)).toDF("g", "v", "tie")
    val out = TopK.topKPerGroup(df, "g", "v", "tie", k = 10)
      .as[(String, Long, Double, Long)].collect().toSet
    assert(out === Set(("g", 1L, 2.0, 1L), ("g", 2L, 1.0, 2L)))
    assert(TopK.topKPerGroup(df.filter(lit(false)), "g", "v", "tie", 3).count() === 0)
  }

  test("partial buffers stay bounded: plan is an object hash aggregate, not a window sort") {
    val df = Seq(("g", 1.0, 1L)).toDF("g", "v", "tie")
    val plan = TopK.topKPerGroup(df, "g", "v", "tie", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"must not fall back to a window sort:\n$plan")
  }
}
