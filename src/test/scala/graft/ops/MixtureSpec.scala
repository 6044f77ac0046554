package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int, src: String) =
    (1 to n).map(i => (s"$src-$i", src)).toDF("id", "src")

  test("whole-number weights emit exactly w epoch-tagged copies") {
    val out = Mixture.mixCorpora(docs(50, "a"), "id", "src", Map("a" -> 3.0))
    assert(out.count() == 150)
    val epochs = out.groupBy("epoch").count()
      .as[(Long, Long)].collect().toMap
    assert(epochs == Map(0L -> 50L, 1L -> 50L, 2L -> 50L))
  }

  test("weight 1.0 is the identity (epoch 0 only)") {
    val out = Mixture.mixCorpora(docs(40, "a"), "id", "src", Map("a" -> 1.0))
    assert(out.select("id").as[String].collect().toSet ==
      (1 to 40).map(i => s"a-$i").toSet)
    assert(out.select("epoch").distinct().as[Long].collect().toSeq == Seq(0L))
  }

  test("fractional weights keep roughly the requested share, deterministically") {
    val d = docs(2000, "a")
    val out1 = Mixture.mixCorpora(d, "id", "src", Map("a" -> 0.5))
      .select("id").as[String].collect().toSet
    val out2 = Mixture.mixCorpora(d, "id", "src", Map("a" -> 0.5))
      .select("id").as[String].collect().toSet
    assert(out1 == out2) // run-to-run deterministic
    assert(math.abs(out1.size - 1000) < 150) // md5-uniform ≈ half
  }

  test("mixes are monotone in the weight (higher w is a superset)") {
    val d = docs(500, "a")
    val lo = Mixture.mixCorpora(d, "id", "src", Map("a" -> 1.3))
      .select("id", "epoch").as[(String, Long)].collect().toSet
    val hi = Mixture.mixCorpora(d, "id", "src", Map("a" -> 1.7))
      .select("id", "epoch").as[(String, Long)].collect().toSet
    assert(lo.subsetOf(hi))
  }

  test("upsample + downsample + default drop in one mix") {
    val d = docs(100, "up").union(docs(100, "keep")).union(docs(100, "gone"))
    val out = Mixture.mixCorpora(d, "id", "src",
      Map("up" -> 2.0, "keep" -> 1.0), defaultWeight = 0.0)
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("up" -> 200L, "keep" -> 100L))
  }

  test("rejects negative weights and reserved columns") {
    intercept[IllegalArgumentException] {
      Mixture.mixCorpora(docs(1, "a"), "id", "src", Map("a" -> -0.1))
    }
    intercept[IllegalArgumentException] {
      Mixture.mixCorpora(docs(1, "a").withColumn("epoch", lit(0)),
        "id", "src", Map("a" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      Mixture.mixCorpora(docs(1, "a").withColumn("__cut", lit("x")),
        "id", "src", Map("a" -> 1.0))
    }
  }
}
