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

  test("temperature mix: alpha=1 equalizes group volumes, alpha=0 is identity") {
    val d = docs(400, "big").union(docs(100, "small"))
    // alpha=1: small gets weight 400/100 = 4.0 → exactly 4 full epochs
    val eq = Mixture.temperatureMix(d, "id", "src", alpha = 1.0, maxEpochs = 8.0)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(eq == Map("big" -> 400L, "small" -> 400L))
    // alpha=0: every weight is 1.0 — the natural distribution, epoch 0 only
    val nat = Mixture.temperatureMix(d, "id", "src", alpha = 0.0)
    assert(nat.groupBy("src").count().as[(String, Long)].collect().toMap
      == Map("big" -> 400L, "small" -> 100L))
    assert(nat.select("epoch").distinct().as[Long].collect().toSeq == Seq(0L))
  }

  test("temperature mix: sqrt alpha lands between natural and equal; cap binds") {
    val d = docs(900, "big").union(docs(100, "small")).union(docs(4, "tiny"))
    val out = Mixture.temperatureMix(d, "id", "src", alpha = 0.5, maxEpochs = 2.0)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(out("big") == 900L)
    // sqrt(900/100) = 3.0, capped at 2.0 → exactly 2 epochs of small
    assert(out("small") == 200L)
    // sqrt(900/4) = 15, capped at 2.0 → 8 rows
    assert(out("tiny") == 8L)
    // null groups are dropped, and a group bound guard exists
    intercept[IllegalArgumentException] {
      Mixture.temperatureMix(d, "id", "src", maxGroups = 2)
    }
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

  test("temperatureMix survives thousands of groups (no CaseWhen stack overflow)") {
    // a 5000-deep nested when() chain overflowed the driver stack in
    // Catalyst's visitors; weights now ride a broadcast join
    val df = spark.range(5000)
      .selectExpr("id", "CAST(id AS STRING) AS grp")
    val out = Mixture.temperatureMix(df, "id", "grp", alpha = 0.5,
      maxEpochs = 2.0, maxGroups = 10000)
    assert(out.count() >= 5000L)
  }

  test("null keys get a shared deterministic fractional draw, never a silent drop") {
    val df = Seq((Some(1L), "a"), (None, "a"), (None, "a"))
      .toDF("id", "src")
    // w = 1.5: epoch 0 full (all 3 rows), epoch 1 fractional — null
    // keys previously evaluated a null predicate → dropped from the
    // fractional epoch only; now they share one draw (both or neither)
    val out = Mixture.mixCorpora(df, "id", "src", Map("a" -> 1.5))
    val epoch0 = out.filter(col("epoch") === 0).count()
    assert(epoch0 === 3L, "full epochs keep every row incl. null keys")
    val nullFrac = out.filter(col("epoch") === 1 && col("id").isNull).count()
    assert(nullFrac === 0L || nullFrac === 2L,
      "null keys decide the fractional epoch together, deterministically")
    // and the same call yields the same result
    val again = Mixture.mixCorpora(df, "id", "src", Map("a" -> 1.5))
      .filter(col("epoch") === 1 && col("id").isNull).count()
    assert(again === nullFrac)
  }
}
