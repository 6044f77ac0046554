package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalIndexSpec extends SparkSpec {
  import spark.implicits._

  test("matches row_number over the same ordering, contiguous from 1") {
    val df = (1 to 1000).map(i => (i * 7919 % 1000, s"v$i")).toDF("k", "v")
      .repartition(7) // scrambled physical layout on purpose
    val got = GlobalIndex.withGlobalIndex(df, Seq(col("k"), col("v")), "idx",
      partitions = Some(5))
      .select("k", "v", "idx").as[(Int, String, Long)].collect().toSeq.sortBy(_._3)
    val want = df
      .withColumn("idx", row_number().over(Window.orderBy(col("k"), col("v"))).cast("long"))
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._3)
    assert(got == want)
    assert(got.map(_._3) == (1L to 1000L))
  }

  test("descending order columns (the vocab-rank shape)") {
    val df = Seq(("a", 3L), ("b", 9L), ("c", 9L), ("d", 1L)).toDF("tok", "cnt")
    val got = GlobalIndex.withGlobalIndex(
      df, Seq(col("cnt").desc, col("tok").asc), "rank", partitions = Some(3))
      .select("tok", "rank").as[(String, Long)].collect().toMap
    assert(got == Map("b" -> 1L, "c" -> 2L, "a" -> 3L, "d" -> 4L))
  }

  test("more partitions than rows leaves no gaps") {
    val df = Seq(1, 2, 3).toDF("k")
    val got = GlobalIndex.withGlobalIndex(df, Seq(col("k")), partitions = Some(16))
      .select("k", "row_idx").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, 1L), (2, 2L), (3, 3L)))
  }

  test("survives a downstream coalesce(1) (single-writer sink shape)") {
    // Regression: coalesce re-numbers tasks, so a TaskContext-based
    // partition id would zero every offset; the pid travels in the
    // cached rows instead.
    val df = (1 to 400).map(i => (i * 31 % 400, i)).toDF("k", "v")
    val got = GlobalIndex.withGlobalIndex(df, Seq(col("k"), col("v")), "idx",
      partitions = Some(6))
      .coalesce(1)
      .select("k", "v", "idx").as[(Int, Int, Long)].collect().toSeq
    val want = df.as[(Int, Int)].collect().toSeq.sortBy(t => (t._1, t._2))
      .zipWithIndex.map { case ((k, v), i) => (k, v, i + 1L) }
    assert(got.sortBy(_._3) == want)
  }

  test("empty input yields empty output with the index column") {
    val df = Seq.empty[Int].toDF("k")
    val out = GlobalIndex.withGlobalIndex(df, Seq(col("k")))
    assert(out.columns.toSeq == Seq("k", "row_idx"))
    assert(out.count() == 0)
  }

  test("rejects an existing index column and empty ordering") {
    val df = Seq((1, 2L)).toDF("k", "row_idx")
    intercept[IllegalArgumentException] {
      GlobalIndex.withGlobalIndex(df, Seq(col("k")))
    }
    intercept[IllegalArgumentException] {
      GlobalIndex.withGlobalIndex(Seq(1).toDF("k"), Seq.empty)
    }
  }
}
