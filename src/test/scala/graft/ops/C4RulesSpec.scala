package graft.ops

import graft.SparkSpec

/** Hand-computed C4 rule outcomes with the PUBLISHED defaults —
  * newline lines, sentence punctuation, javascript/cookie line
  * blocklist, lorem-ipsum/brace document blocklist, 3-line minimum.
  */
class C4RulesSpec extends SparkSpec {
  import spark.implicits._

  private def auditOf(r: C4Rules.Rules, rows: (Long, String)*): Map[Long, Map[String, Any]] = {
    val df = rows.toSeq.toDF("id", "text")
    val out = C4Rules.audit(df, "id", "text", r)
    val cols = out.columns
    out.collect().map { row =>
      row.getLong(0) -> cols.zipWithIndex.map { case (c, i) => c -> row.get(i) }.toMap
    }.toMap
  }

  test("line rules: terminal punctuation, min words, blocklist each drop lines") {
    val a = auditOf(C4Rules.Rules(minKeptLines = 2),
      1L -> "This line is kept.\nAnd so is this one!\nno terminal marker\nToo short.\nEnable javascript to continue.",
      2L -> "Only one good sentence here.\nnope\nnope again")
    assert(a(1L)("n_lines") == 5L)
    assert(a(1L)("kept_lines") == 2L)
    assert(a(1L)("keep") == true)
    assert(a(1L)("clean_text") == "This line is kept.\nAnd so is this one!")
    assert(a(2L)("kept_lines") == 1L && a(2L)("keep") == false)
  }

  test("document blocklist and minimum surviving lines gate the document") {
    val threeGood = "One good sentence right here.\nAnother good sentence follows it.\nA third keeps it alive."
    val a = auditOf(C4Rules.Rules(),
      1L -> threeGood,
      2L -> (threeGood + "\nAlso some lorem ipsum filler."),
      3L -> (threeGood + "\nfunction f() { return 1; }"),
      4L -> "Two good sentences only here.\nSo the page is dropped now.")
    assert(a(1L)("keep") == true && a(1L)("kept_lines") == 3L)
    assert(a(2L)("has_doc_block") == true && a(2L)("keep") == false)
    assert(a(3L)("has_doc_block") == true && a(3L)("keep") == false)
    assert(a(4L)("kept_lines") == 2L && a(4L)("keep") == false)
  }

  test("quote terminal marker counts; blank lines are not lines; null/empty fail closed") {
    val a = auditOf(C4Rules.Rules(minKeptLines = 1),
      1L -> "\"A quoted sentence counts.\"\n\n\n  \nsecond real line here.",
      2L -> "",
      3L -> null)
    assert(a(1L)("n_lines") == 2L && a(1L)("kept_lines") == 2L)
    Seq(2L, 3L).foreach { id =>
      assert(a(id)("n_lines") == 0L, s"doc $id")
      assert(a(id)("keep") == false, s"doc $id")
      assert(a(id)("clean_text") == null, s"doc $id")
    }
  }

  test("clean rewrites text to surviving lines and keeps only keep=true rows") {
    val df = Seq(
      (1L, "Keep this sentence now.\njunk\nAnd keep this one too.\nAnd a third survivor here."),
      (2L, "not enough.")).toDF("id", "text")
    val out = C4Rules.clean(df, "text").as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L))
    assert(out(1L) == "Keep this sentence now.\nAnd keep this one too.\nAnd a third survivor here.")
  }

  test("blocklists are case-insensitive") {
    val a = auditOf(C4Rules.Rules(minKeptLines = 1),
      1L -> "Enable JavaScript to see this page.\nA fine sentence survives here.",
      2L -> "A fine sentence survives here.\nLOREM IPSUM dolor sit amet.")
    assert(a(1L)("kept_lines") == 1L && a(1L)("keep") == true)
    assert(a(2L)("has_doc_block") == true && a(2L)("keep") == false)
  }
}
