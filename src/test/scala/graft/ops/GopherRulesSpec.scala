package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed Gopher rule outcomes — each rule exercised from both
  * sides of its threshold, plus null/empty/degenerate documents.
  */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private val t = GopherRules.Thresholds(
    minWords = 3, maxWords = 6, minStopwords = 1)

  private def auditOf(rows: (Long, String)*): Map[Long, Map[String, Any]] = {
    val df = rows.toSeq.toDF("id", "text")
    val out = GopherRules.audit(df, "id", "text", t)
    val cols = out.columns
    out.collect().map { r =>
      r.getLong(0) -> cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
    }.toMap
  }

  test("word count, mean length, stopword and alpha rules each gate from both sides") {
    val a = auditOf(
      1L -> "the cat sat",            // 3 words, mean 3, "the" → keep
      2L -> "to be",                  // 2 words → ok_words false
      3L -> "one two three four five six seven", // 7 words → ok_words false
      4L -> "the ab cd",              // mean 8/3 < 3 → ok_mean_len false
      5L -> "the abcdefghijklmn nopqrstuvwxyzabc", // mean 32/3 > 10 → false
      6L -> "cat sat mat",            // no stopword → ok_stop false
      7L -> "the 12 345")             // alpha 1/3 < 4/5 → ok_alpha false
    assert(a(1L)("keep") == true)
    assert(a(1L)("n_words") == 3L && a(1L)("char_sum") == 9L)
    assert(a(1L)("mean_word_len") == 3.0)
    assert(a(2L)("ok_words") == false && a(3L)("ok_words") == false)
    assert(a(4L)("ok_mean_len") == false)
    assert(a(5L)("ok_mean_len") == false)
    assert(a(6L)("ok_stop") == false && a(6L)("keep") == false)
    assert(a(7L)("ok_alpha") == false)
  }

  test("symbol ratio counts # and ... against words") {
    // 5 words, 1 '#': 1*10 > 5*1 → fails; '...' counted in triples
    val a = auditOf(
      1L -> "the cat sat on mat#",
      2L -> "the cat... sat ..on mat")
    assert(a(1L)("symbol_hits") == 1L && a(1L)("ok_symbol") == false)
    assert(a(2L)("symbol_hits") == 1L) // one full "...", the ".." is not counted
  }

  test("empty, whitespace and null text fail closed with null mean") {
    val a = auditOf(1L -> "", 2L -> "   ", 3L -> null)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(a(id)("n_words") == 0L, s"doc $id")
      assert(a(id)("keep") == false, s"doc $id")
      assert(a(id)("mean_word_len") == null, s"doc $id")
    }
  }

  test("filterQuality keeps exactly the keep=true rows") {
    val df = Seq((1L, "the cat sat"), (2L, "xx")).toDF("id", "text")
    assert(GopherRules.filterQuality(df, "text", t)
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("stopword hits count distinct stopwords present, case-insensitively") {
    val a = auditOf(1L -> "The cat of the mat")
    assert(a(1L)("stop_hits") == 2L) // the + of, "the" once despite two hits
  }
}
