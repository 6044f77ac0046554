package graft.ops

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def run(ratioMilli: Int, minDocs: Int,
      rows: (Long, String, String)*): Map[Long, String] =
    Boilerplate.domainBoilerplate(
        rows.toSeq.toDF("id", "domain", "text"),
        "id", "domain", "text", ratioMilli, minDocs)
      .as[(Long, String)].collect().toMap

  test("a line in half a site's pages is removed site-wide, incl. first occurrence") {
    val out = run(500, 2,
      (1L, "a.com", "subscribe now\nunique one"),
      (2L, "a.com", "subscribe now\nunique two"),
      (3L, "a.com", "unique three\nextra"),
      (4L, "a.com", "unique four"))
    // "subscribe now" hits 2 of 4 docs = exactly 500 milli -> removed
    assert(out(1L) == "unique one")
    assert(out(2L) == "unique two")
    assert(out(3L) == "unique three\nextra")
    assert(out(4L) == "unique four")
  }

  test("the threshold is per-domain: the same line survives on a mixed site") {
    val out = run(500, 2,
      (1L, "a.com", "promo line\nalpha"),
      (2L, "a.com", "promo line\nbeta"),
      (3L, "b.com", "promo line\ngamma"),
      (4L, "b.com", "delta"),
      (5L, "b.com", "epsilon"),
      (6L, "b.com", "zeta"))
    assert(out(1L) == "alpha" && out(2L) == "beta")
    // 1 of 4 docs on b.com = 250 milli < 500 -> kept there
    assert(out(3L) == "promo line\ngamma")
  }

  test("minDocs floors tiny domains; doc frequency is per-DISTINCT-doc") {
    // Single-page site: its every line is 100% of the site but minDocs=2
    // keeps it. Doc 2 repeats the line IN-doc: still one distinct doc.
    val out = run(500, 2,
      (1L, "solo.com", "only page line"),
      (2L, "rep.com", "echo\necho\nother"),
      (3L, "rep.com", "third"),
      (4L, "rep.com", "fourth"))
    assert(out(1L) == "only page line")
    // echo: 1 distinct doc of 3 = 333 milli < 500 -> kept (both copies)
    assert(out(2L) == "echo\necho\nother")
  }

  test("a fully-boilerplate document survives with empty text; null text too") {
    val df = Seq(
      (1L, "a.com", "banner"),
      (2L, "a.com", "banner"),
      (3L, "a.com", null.asInstanceOf[String])
    ).toDF("id", "domain", "text")
    val out = Boilerplate.domainBoilerplate(df, "id", "domain", "text", 500, 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "" && out(2L) == "" && out(3L) == "")
    assert(out.size == 3)
  }

  test("domainBoilerplateSet reports the digest set with frequencies") {
    val df = Seq(
      (1L, "a.com", "banner\nx"),
      (2L, "a.com", "banner\ny"),
      (3L, "a.com", "z")
    ).toDF("id", "domain", "text")
    val set = Boilerplate.domainBoilerplateSet(df, "id", "domain", "text", 500, 2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(set == Set(("a.com", "banner", 2L, 3L)))
  }

  test("parameter validation is eager and loud") {
    val df = Seq((1L, "a", "t")).toDF("id", "domain", "text")
    intercept[IllegalArgumentException] {
      Boilerplate.domainBoilerplate(df, "id", "domain", "text", 0)
    }
    intercept[IllegalArgumentException] {
      Boilerplate.domainBoilerplate(df, "id", "domain", "text", 1001)
    }
    intercept[IllegalArgumentException] {
      Boilerplate.domainBoilerplate(df, "id", "domain", "text", 500, 0)
    }
  }
}
