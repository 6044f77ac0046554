package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed extraction cases for [[Html.extractText]] — each case
  * targets one rule-ordering hazard from the object doc.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String*): Seq[Option[String]] =
    html.toDF("h").select(Html.extractText(col("h")).as("t"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("strips tags, collapses whitespace, trims") {
    assert(extract("<html><body><h1>Title</h1>\n  <p>a  b</p></body></html>") ==
      Seq(Some("Title a b")))
  }

  test("script and style character data is dropped, even with markup inside") {
    // the JS string literal contains "</div>" and a bare '<' — block
    // removal must fire before the generic tag strip
    assert(extract(
      """<head><script type="t">if(x<2){s="</div>";}</script>""" +
        "<style media=\"all\">p>span{color:red}</style></head><p>keep</p>") ==
      Seq(Some("keep")))
    // case-insensitive, and a spaced closer `</script >` still closes
    assert(extract("<SCRIPT>var x=1;</SCRIPT ><b>k</b>") == Seq(Some("k")))
  }

  test("comments vanish including markup inside them") {
    assert(extract("a <!-- hidden <b>bold</b> --> z") == Seq(Some("a z")))
  }

  test("'>' inside a quoted attribute value does not end the tag") {
    assert(extract("""<body data-note="a>b" x='c>d'>text</body>""") ==
      Seq(Some("text")))
  }

  test("entities decode after tag stripping; &amp; decodes last") {
    // &lt;b&gt; is ESCAPED markup — it must surface as literal <b>,
    // not be stripped as a tag
    assert(extract("<p>&lt;b&gt; &quot;q&quot; &#39;a&#39;&nbsp;&amp;</p>") ==
      Seq(Some("<b> \"q\" 'a' &")))
    // &amp;lt; renders as the 4 chars `&lt;` — double-decode is a bug
    assert(extract("<p>&amp;lt;</p>") == Seq(Some("&lt;")))
    // numeric references pass through literally (documented non-goal)
    assert(extract("<p>a&#160;b</p>") == Seq(Some("a&#160;b")))
  }

  test("null html has no text identity") {
    val got = Seq((1, Option.empty[String]), (2, Some("<p>x</p>")))
      .toDF("id", "h").select(Html.extractText(col("h")).as("t"))
      .collect().map(r => Option(r.getString(0))).toSet
    assert(got == Set(None, Some("x")))
  }

  private def anchors(html: String): Seq[(String, String)] =
    Seq(html).toDF("h")
      .select(explode(Html.extractAnchors(col("h"))).as("p"))
      .select(col("p.href"), col("p.anchor"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("extractAnchors pairs each href with its cleaned anchor text, in order") {
    val html =
      """<a href="http://a.com/x">read <b>more</b> here</a>
        |<a href='http://b.org/y'> visit &amp;  enjoy </a>
        |<a href="/rel">relative ok</a>""".stripMargin
    assert(anchors(html) == Seq(
      ("http://a.com/x", "read more here"),
      ("http://b.org/y", "visit & enjoy"),
      ("/rel", "relative ok")))
  }

  test("extractAnchors: unclosed anchors yield no pair (extractLinks still counts them)") {
    val html = "<a href=\"http://a.com/1\">ok</a><a href=\"http://b.com/2\">never closed"
    assert(anchors(html) == Seq(("http://a.com/1", "ok")))
    val links = Seq(html).toDF("h")
      .select(Html.extractLinks(col("h")).as("l"))
      .collect().head.getSeq[String](0)
    assert(links == Seq("http://a.com/1", "http://b.com/2"))
    // null html → null array (no anchor identity)
    val n = Seq(Option.empty[String]).toDF("h")
      .select(Html.extractAnchors(col("h")).as("a")).collect().head
    assert(n.isNullAt(0))
  }
}
