package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed Unicode-script profiles ([[Scripts]]). */
class ScriptsSpec extends SparkSpec {
  import spark.implicits._

  private def profile(texts: Option[String]*) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    Scripts.withScriptProfile(df, "text")
      .select($"id", $"latin_n", $"cyrillic_n", $"greek_n", $"han_n",
        $"other_n", $"dominant_script")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), Option(r.get(5)), Option(r.getString(6)))).toMap
  }

  test("script counts: codepoint-exact per class, everything else lands in other") {
    val got = profile(
      Some("ab c привет!你你"),  // 3 latin, 6 cyrillic, 2 han, 3 other (2 sp + !)
      Some("γεια σου"),          // 7 greek, 1 other
      Some("12345 ..."),         // all other
      Some(""))                  // empty: all zero, dominant ties to latin
    assert(got(0L) == ((Some(3), Some(6), Some(0), Some(2), Some(3), Some("cyrillic"))))
    assert(got(1L) == ((Some(0), Some(0), Some(7), Some(0), Some(1), Some("greek"))))
    assert(got(2L) == ((Some(0), Some(0), Some(0), Some(0), Some(9), Some("latin"))))
    assert(got(3L) == ((Some(0), Some(0), Some(0), Some(0), Some(0), Some("latin"))))
  }

  test("dominant ties break by fixed priority (latin > cyrillic > greek > han); null text → nulls") {
    val got = profile(
      Some("ab пр"),   // latin 2 == cyrillic 2 → latin
      Some("πα 你你"),  // greek 2 == han 2 → greek
      None)
    assert(got(0L)._6 == Some("latin"))
    assert(got(1L)._6 == Some("greek"))
    assert(got(2L) == ((None, None, None, None, None, None)))
  }

  test("script profile is shuffle-free (row-local expressions only)") {
    val out = Scripts.withScriptProfile(Seq((1L, "x")).toDF("id", "text"), "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }
}
