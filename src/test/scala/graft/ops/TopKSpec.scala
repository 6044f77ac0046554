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

  test("long order values above 2^53 fail loudly instead of ranking wrongly") {
    // 2^53 and 2^53+1 collapse to the same double; the tie column
    // would then pick the SMALLER order value as top-1
    val df = Seq(("g", 9007199254740993L, 2L), ("g", 9007199254740992L, 1L))
      .toDF("g", "v", "tie")
    val e = intercept[Exception](TopK.topKPerGroup(df, "g", "v", "tie", 1).collect())
    assert(e.getMessage.contains("not exactly representable") ||
      Option(e.getCause).exists(_.getMessage.contains("not exactly representable")))
    // exactly-representable longs still work
    val ok = TopK.topKPerGroup(
        Seq(("g", 9007199254740992L, 1L), ("g", 3L, 2L)).toDF("g", "v", "tie"),
        "g", "v", "tie", 1)
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(ok == Seq(("g", 1L, 9007199254740992.0, 1L)))
  }

  test("sorted-buffer invariant survives reduce fast path and merge (big shuffled input)") {
    // adversarial orders: ascending (every row wins → full inserts),
    // descending (every row loses → O(1) fast path), interleaved
    val patterns = Seq(
      (1 to 500).map(_.toDouble),
      (1 to 500).map(i => (500 - i).toDouble),
      (1 to 500).map(i => if (i % 2 == 0) i.toDouble else (1000 - i).toDouble))
    patterns.zipWithIndex.foreach { case (vs, p) =>
      val df = vs.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
        .toDF("g", "v", "tie").repartition(7) // force multi-buffer merges
      val got = TopK.topKPerGroup(df, "g", "v", "tie", 5)
        .as[(String, Long, Double, Long)].collect().sortBy(_._2).map(r => (r._3, r._4))
      val want = vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
        .sortBy { case (v, t) => (-v, t) }.take(5)
      assert(got.toSeq == want, s"pattern $p")
    }
  }

  test("partial buffers stay bounded: plan is an object hash aggregate, not a window sort") {
    val df = Seq(("g", 1.0, 1L)).toDF("g", "v", "tie")
    val plan = TopK.topKPerGroup(df, "g", "v", "tie", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"must not fall back to a window sort:\n$plan")
  }
}
