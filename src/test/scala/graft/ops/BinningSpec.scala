package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinningSpec extends SparkSpec {
  import spark.implicits._

  test("quartile bins match a hand-computed reference") {
    // group a: values 1..8 → boundaries at ceil(8*.25)=2nd, 4th, 6th
    // rows: (1,2)→0, (3,4)→1, (5,6)→2, (7,8)→3
    val df = (1 to 8).map(v => ("a", v.toLong, v.toLong)).toDF("g", "id", "v")
    val got = Binning.quantileBins(df, "g", "v", Seq("id"), bins = 4)
      .select("v", "bin").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 3L, 8L -> 3L))
  }

  test("ties on a boundary value share the lower bin (engine-reproducible)") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
      ("a", 4L, 20L)).toDF("g", "id", "v")
    val got = Binning.quantileBins(df, "g", "v", Seq("id"), bins = 2)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    // median boundary = 10 (2nd of 4); all three 10s stay in bin 0
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("groups bin independently; constant group collapses to bin 0") {
    val df = (1 to 6).map(v => ("grow", v.toLong, v.toLong * 100)).toDF("g", "id", "v")
      .union(Seq(("flat", 7L, 5L), ("flat", 8L, 5L)).toDF("g", "id", "v"))
    val got = Binning.quantileBins(df, "g", "v", Seq("id"), bins = 3)
      .select("g", "id", "bin").as[(String, Long, Long)].collect()
    assert(got.filter(_._1 == "flat").map(_._3).toSet == Set(0L))
    assert(got.filter(_._1 == "grow").map(_._3).toSet == Set(0L, 1L, 2L))
  }

  test("null GROUP keys get a null bin instead of crashing the boundary pass") {
    // Regression: exactDiscrete's histogram join drops null groups but
    // its range aggregate kept them — the driver walk then threw
    // NoSuchElementException(null). Null groups now have no boundaries
    // and their rows bin to null via the left join.
    val df = Seq((Some("a"), 1L, 10L), (Some("a"), 2L, 20L),
      (None: Option[String], 3L, 10L), (None, 4L, 20L)).toDF("g", "id", "v")
    val out = Binning.quantileBins(df, "g", "v", Seq("id"), bins = 2)
    assert(out.count() == 4)
    val nullG = out.filter(col("g").isNull).select("bin")
    assert(nullG.count() == 2 && nullG.filter(col("bin").isNull).count() == 2)
    assert(out.filter(col("g") === "a" && col("bin").isNotNull).count() == 2)
  }

  test("null values get a null bin; no rows are dropped") {
    val df = Seq(("a", 1L, Some(1L)), ("a", 2L, None), ("a", 3L, Some(3L)),
      ("a", 4L, Some(4L))).toDF("g", "id", "v")
    val out = Binning.quantileBins(df, "g", "v", Seq("id"), bins = 2)
    assert(out.count() == 4)
    assert(out.filter(col("id") === 2).select("bin").first().isNullAt(0))
  }

  test("rejects bins < 2 and an existing bin column") {
    val df = Seq(("a", 1L, 1L)).toDF("g", "id", "v")
    intercept[IllegalArgumentException] {
      Binning.quantileBins(df, "g", "v", Seq("id"), bins = 1)
    }
    intercept[IllegalArgumentException] {
      Binning.quantileBins(df.withColumn("bin", lit(0)), "g", "v", Seq("id"), 2)
    }
  }
}
