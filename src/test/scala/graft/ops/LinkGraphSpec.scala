package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("extractLinks: quoted hrefs in order; relative/mailto kept raw; null html -> null") {
    val html =
      """<html><body>
        |<a href="http://a.com/1">one</a>
        |<A CLASS="x" HREF='https://b.com/2'>two</A>
        |<a data-k="v" href="/relative">three</a>
        |<a href="mailto:x@y.z">four</a>
        |<a name="no-href-anchor">five</a>
        |<p href="http://not-an-anchor.com">six</p>
        |</body></html>""".stripMargin
    val got = Seq(Some(html), None).toDF("h")
      .select(Html.extractLinks(col("h")).as("l"))
      .collect().map(r => Option(r.getSeq[String](0))).toSeq
    assert(got == Seq(
      Some(Seq("http://a.com/1", "https://b.com/2", "/relative", "mailto:x@y.z")),
      None))
  }

  test("extractLinks: a runaway quote never escapes the tag") {
    // unterminated quote: no link at all, NOT a garbage URL spanning
    // into the following markup (which would fabricate graph edges)
    val unterminated =
      """<a href="http://a.com/x>one</a><p>don't stop</p><a href="http://b.com/y">two</a>"""
    val got = Seq(unterminated).toDF("h")
      .select(Html.extractLinks(col("h")).as("l"))
      .collect().head.getSeq[String](0)
    assert(got == Seq("http://b.com/y"), got)
    // mismatched quote inside the value: truncated at it (documented)
    val mismatched = """<a href="a'b">m</a>"""
    val got2 = Seq(mismatched).toDF("h")
      .select(Html.extractLinks(col("h")).as("l"))
      .collect().head.getSeq[String](0)
    assert(got2 == Seq("a"), got2)
  }

  test("domainEdges: absolute http(s) only, registrable rollup, self-edges dropped, counted") {
    val df = Seq(
      ("http://www.news.co.uk/a", Seq("https://Blog.Example.com/x",
        "http://news.co.uk/other", "/rel", "ftp://files.example.com/f")),
      ("http://sport.news.co.uk/b", Seq("HTTP://example.com/y")),
      ("garbage-url", Seq("http://example.com/z")),
      ("http://solo.org/c", Seq.empty[String]))
      .toDF("url", "links")
    val got = LinkGraph.domainEdges(df, "url", "links")
      .as[(String, String, Long)].collect().toSet
    // both news.co.uk pages endorse example.com (subdomains roll up);
    // the intra-site link, the relative link, the ftp link, and the
    // unparseable src all drop; the linkless page emits nothing
    assert(got == Set(("news.co.uk", "example.com", 2L)))
  }

  test("pageRankInt: hand-computed two-sweep ranks on a 3-node cycle with a feeder") {
    // a -> b, b -> c, c -> a (cycle), d -> a (feeder; d is dangling-in)
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")).toDF("src", "dst")
    val r1 = LinkGraph.pageRankInt(e, iters = 1)
      .as[(String, Long)].collect().toMap
    // unit=1e6, base=150000, all out-degrees 1
    // sweep 1: a <- c + d = 150000 + 85*2000000/100 = 1850000
    //          b <- a = 150000 + 850000 = 1000000; c likewise; d gets base
    assert(r1 == Map("a" -> 1850000L, "b" -> 1000000L, "c" -> 1000000L,
      "d" -> 150000L))
    val r2 = LinkGraph.pageRankInt(e, iters = 2)
      .as[(String, Long)].collect().toMap
    // sweep 2: a <- c(1000000) + d(150000) -> 150000 + 85*1150000/100
    //          b <- a(1850000) -> 150000 + 1572500; c <- b(1000000)
    assert(r2 == Map("a" -> 1127500L, "b" -> 1722500L, "c" -> 1000000L,
      "d" -> 150000L))
    // total mass leaks only through truncation here (every node has
    // out-edges except d's absence of IN-edges keeps it at base)
  }

  test("pageRankInt: duplicate and self-loop edges do not distort ranks; guards fire") {
    val e = Seq(("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")).toDF("src", "dst")
    val r = LinkGraph.pageRankInt(e, iters = 1).as[(String, Long)].collect().toMap
    // after distinct + self-loop drop: a <-> b, both degree 1
    assert(r == Map("a" -> 1000000L, "b" -> 1000000L))
    assertThrows[IllegalArgumentException](LinkGraph.pageRankInt(e, 0))
    assertThrows[IllegalArgumentException](LinkGraph.pageRankInt(e, 1, dampingPct = 100))
    assertThrows[IllegalArgumentException](
      LinkGraph.pageRankInt(e.toDF("from", "to"), 1))
  }

  test("pageRankInt: dangling mass leaks (documented), ordering still meaningful") {
    // star into a sink: s1,s2,s3 -> hub; hub has no out-edges
    val e = Seq(("s1", "hub"), ("s2", "hub"), ("s3", "hub")).toDF("src", "dst")
    val r = LinkGraph.pageRankInt(e, iters = 3).as[(String, Long)].collect().toMap
    assert(r("hub") > r("s1") && r("s1") == r("s2") && r("s2") == r("s3"))
    // spokes converge to base (nothing points at them)
    assert(r("s1") == 150000L)
  }
}
