package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick fox and the dog run of a hill", "s0"), // en, 10 toks
    (2L, "der hund und die katze das haus", "s0"), //          de → dropped
    (3L, "the quick  fox and the dog run of a hill", "s1"), // dup of 1 (ws-normalized)
    (4L, "the and of a", "s2"), //                             en but only 4 tokens
    (5L, "the contact and of a bob@x.co here now ok", "s3")) // en, has PII
    .toDF("id", "text", "src")

  private def run(minTokens: Int = 5) =
    CorpusPrep.prepare(docs, "id", "text", keepLang = "en",
      minTokens = minTokens, maxTokens = 100, maxStopwordRatio = 0.6)

  test("composes language filter, quality filter, dedup and redaction") {
    val out = run().select("id", "text", "src")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(1L, 5L)) // 2 wrong lang, 3 dup-of-1, 4 too short
    assert(out.head._2 == "the quick fox and the dog run of a hill")
    assert(out(1)._2 == "the contact and of a <EMAIL> here now ok")
    assert(out.map(_._3) == Seq("s0", "s3")) // other columns survive
  }

  test("duplicates keep the smallest id regardless of row order") {
    // make the duplicate the smaller id: 0 dups 1's normalized text
    val flipped = Seq(
      (9L, "the quick fox and the dog run of a hill", "a"),
      (0L, "the   quick fox and the dog run of a hill", "b")).toDF("id", "text", "src")
    val out = CorpusPrep.prepare(flipped, "id", "text", keepLang = "en")
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(0L))
  }

  test("stopword ratio bound drops marker-stuffed docs") {
    // 6 of 8 tokens are en markers → ratio 0.75 > 0.6
    val stuffed = Seq((1L, "the a of and the a fox dog", "s")).toDF("id", "text", "src")
    assert(CorpusPrep.prepare(stuffed, "id", "text",
      maxStopwordRatio = 0.6).count() == 0L)
    assert(CorpusPrep.prepare(stuffed, "id", "text",
      maxStopwordRatio = 0.8).count() == 1L)
  }

  test("langGuess resolves ties deterministically (en wins, then de, then fr)") {
    val out = Seq("the der", "der le", "le x", "zzz")
      .toDF("t").select(CorpusPrep.langGuess(col("t"))).as[String].collect().toSeq
    assert(out == Seq("en", "de", "fr", "und"))
  }

  test("the composed pipeline is a single-exchange plan with map-side dup pruning") {
    val plan = run().queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"pipeline must shuffle exactly once (the dedup window):\n$plan")
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      "duplicates must be pruned map-side before the exchange")
  }

  test("rejects reserved column names eagerly") {
    val bad = Seq((1L, "x", 0)).toDF("id", "text", "__fp")
    intercept[IllegalArgumentException] {
      CorpusPrep.prepare(bad, "id", "text")
    }
  }
}
