package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable HLL distinct-count artifacts ([[Sketch]]): error bounds at
  * real cardinality, the merge-is-union invariant across shardings, and
  * the loud-failure modes.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  // 3 sources × 20k values with a DESIGNED overlap: source s holds
  // v ∈ [s·10000, s·10000 + 20000) — adjacent sources share 10k values,
  // so per-source exact = 20000 and the union = 40000 (NOT the 60000 a
  // broken double-counting merge would report).
  private def corpus = spark.range(0, 60000)
    .select((col("id") / 20000).cast("int").cast("string").as("source"),
      (pmod(col("id"), lit(20000)) +
        (col("id") / 20000).cast("int") * 10000).cast("string").as("tok"))

  test("hllFit estimates per-group distinct counts within the bound at 20k cardinality") {
    val fit = Sketch.hllFit(corpus, "tok", Seq("source"))
    val got = fit.select(col("source"), Sketch.estimate(col("hll")).as("est"),
        Sketch.hllWithinBound(col("hll"), lit(20000L)).as("ok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == 3)
    got.foreach { case (src, est, ok) =>
      assert(ok, s"source $src estimate $est outside 6% of 20000")
      assert(math.abs(est - 20000L) <= 1200, s"source $src: $est")
    }
  }

  test("hllMerge is distinct-UNION across overlapping shards, not a sum") {
    val fit = Sketch.hllFit(corpus, "tok", Seq("source"))
    val merged = Sketch.hllMerge(fit.withColumn("source", lit("ALL")), Seq("source"))
    val est = merged.select(Sketch.estimate(col("hll"))).as[Long].head()
    // union is 40000; a double-counting merge would sit near 60000
    assert(math.abs(est - 40000L) <= 2400, s"union estimate $est")
    // and merging a RE-SHARDED fit (random 5-way split of the same rows)
    // lands on the same union — the artifact is sharding-independent
    val resharded = Sketch.hllFit(
      corpus.withColumn("source", pmod(crc32(col("tok")), lit(5)).cast("string")),
      "tok", Seq("source"))
    val est2 = Sketch.hllMerge(resharded.withColumn("source", lit("ALL")),
        Seq("source"))
      .select(Sketch.estimate(col("hll"))).as[Long].head()
    assert(math.abs(est2 - 40000L) <= 2400, s"resharded union estimate $est2")
  }

  test("empty groupCols → one global row; nulls never count; tiny groups are exact") {
    val df = Seq(Some("a"), Some("b"), Some("a"), None).toDF("tok")
    val fit = Sketch.hllFit(df, "tok", Nil)
    val est = fit.select(Sketch.estimate(col("hll"))).as[Long].collect().toSeq
    assert(est == Seq(2L))
    val merged = Sketch.hllMerge(fit, Nil)
    assert(merged.select(Sketch.estimate(col("hll"))).as[Long].head() == 2L)
  }

  test("hllFit rejects an out-of-range lgK loudly") {
    val df = Seq("a").toDF("tok")
    assertThrows[IllegalArgumentException](Sketch.hllFit(df, "tok", Nil, lgK = 3))
    assertThrows[IllegalArgumentException](Sketch.hllFit(df, "tok", Nil, lgK = 22))
  }

  test("mixed-lgK artifacts fail the merge instead of silently degrading") {
    val a = Sketch.hllFit(Seq("a", "b").toDF("tok"), "tok", Nil, lgK = 12)
    val b = Sketch.hllFit(Seq("c", "d").toDF("tok"), "tok", Nil, lgK = 10)
    val ex = intercept[Exception] {
      Sketch.hllMerge(a.unionByName(b), Nil).collect()
    }
    assert(ex.getMessage != null)
  }
}
