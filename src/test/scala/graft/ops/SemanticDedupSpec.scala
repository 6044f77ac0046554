package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.semanticDedup]] — SemDeDup-style within-cluster
  * near-duplicate removal.
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def dedup(rows: Seq[(Long, Array[Float])], threshold: Double = 0.9,
      maxCluster: Int = 4096): Seq[Long] =
    Similarity.semanticDedup(
      rows.toDF("id", "vec"), "id", "vec",
      Similarity.signBitSketch(col("vec"), 2), threshold, maxCluster)
      .select("id").as[Long].collect().sorted.toSeq

  test("drops the higher id of a same-cluster near-dup pair") {
    // identical direction → cosine 1; both have vec[0]>0, vec[1]>0 →
    // same sign-bit cluster
    assert(dedup(Seq(
      1L -> Array(1f, 1f, 0f),
      2L -> Array(2f, 2f, 0f),
      3L -> Array(1f, -1f, 0f))) == Seq(1L, 3L))
  }

  test("near-dups in different clusters both survive (documented approximation)") {
    // cosine ≈ 0.9999 but the first coordinates differ in sign →
    // different sign-bit cluster → never compared
    assert(dedup(Seq(
      1L -> Array(0.01f, 1f, 0f),
      2L -> Array(-0.01f, 1f, 0f))) == Seq(1L, 2L))
  }

  test("a chain keeps only its smallest id even when the ends are not near-dups") {
    // a~b (cos ≈ .996), b~c (cos ≈ .995), a~c (cos ≈ .982 < t): b is
    // dropped by a, c is dropped by b — dropped rows still dominate.
    // (All second coords positive so all three share a sign-bit cluster.)
    val rows = Seq(
      1L -> Array(1f, 0.01f, 0f),
      2L -> Array(1f, 0.1f, 0f),
      3L -> Array(1f, 0.2f, 0f))
    assert(dedup(rows, threshold = 0.99) == Seq(1L))
    assert(dedup(rows, threshold = 0.9) == Seq(1L))
  }

  test("clusters above maxCluster pass through unjudged") {
    // 4 identical vectors in one cluster; cap 3 → cluster skipped,
    // everyone survives; cap 4 → only the smallest id survives
    val rows = (1L to 4L).map(i => i -> Array(1f, 1f, 0f))
    assert(dedup(rows, maxCluster = 3) == Seq(1L, 2L, 3L, 4L))
    assert(dedup(rows, maxCluster = 4) == Seq(1L))
  }

  test("survivors keep every original column") {
    val df = Seq((1L, Array(1f, 0f), "keep"), (2L, Array(0f, 1f), "also"))
      .toDF("id", "vec", "tag")
    val out = Similarity.semanticDedup(df, "id", "vec",
      Similarity.signBitSketch(col("vec"), 2), 0.9)
    assert(out.columns.toSeq == Seq("id", "vec", "tag"))
    assert(out.select("tag").as[String].collect().sorted.toSeq == Seq("also", "keep"))
  }

  test("rejects reserved column names eagerly") {
    val df = Seq((1L, Array(1f), 0)).toDF("id", "vec", "__c")
    intercept[IllegalArgumentException] {
      Similarity.semanticDedup(df, "id", "vec", lit(0), 0.9)
    }
  }

  test("signBitSketch maps sign patterns to distinct cluster ids") {
    val out = Seq(
      Array(1f, 1f), Array(1f, -1f), Array(-1f, 1f), Array(-1f, -1f))
      .toDF("vec")
      .select(Similarity.signBitSketch(col("vec"), 2).as("c"))
      .as[Int].collect().toSeq
    assert(out == Seq(3, 2, 1, 0))
  }
}
