package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed canonicalization cases for the URL-curation surface. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[Option[String]] =
    urls.toDF("u").select(Urls.normalizeUrl(col("u")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("normalize: case, userinfo, default port, www, slashes, tracking, order, fragment") {
    assert(norm("HTTPS://u:p@WWW.Site.COM:443/a/b/?utm_source=x&z=1&a=2#frag") ==
      Seq(Some("https://site.com/a/b?a=2&z=1")))
    // non-default port kept; non-http scheme untouched
    assert(norm("http://example.com:8080/x", "ftp://example.com/x") ==
      Seq(Some("http://example.com:8080/x"), Some("ftp://example.com/x")))
    // root path renders empty; only-tracking query drops the '?'
    assert(norm("http://a.com/", "http://a.com/?utm_campaign=c&fbclid=z") ==
      Seq(Some("http://a.com"), Some("http://a.com")))
    // :80 is default only for http — an https URL keeps it
    assert(norm("https://a.com:80/x") == Seq(Some("https://a.com:80/x")))
    // slash runs collapse off the tail only
    assert(norm("http://a.com/a///") == Seq(Some("http://a.com/a")))
    // unparseable rows have no canonical identity
    assert(norm("not a url", "://missing.scheme") == Seq(None, None))
  }

  test("registrable domain: eTLD+1 with the multi-part suffix set") {
    val got = Seq("blog.site.co.uk", "a.b.site.com", "site.com", "site.co.uk",
        "localhost")
      .toDF("h").select(Urls.registrableDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("site.co.uk", "site.com", "site.com", "site.co.uk",
      "localhost"))
  }

  test("dedupByUrl keeps the smallest id per canonical and all unparseable rows") {
    val df = Seq(
      (1L, "http://A.com/x?utm_source=t"),
      (2L, "http://a.com/x/"),       // same canonical as 1 → dropped
      (3L, "https://a.com/x"),       // different scheme → kept
      (4L, "garbage"),               // no identity → kept
      (5L, "also garbage"))          // no identity → kept
      .toDF("doc_id", "url")
    val kept = Urls.dedupByUrl(df, "doc_id", "url")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 5L))
    // original columns survive untouched
    assert(Urls.dedupByUrl(df, "doc_id", "url").columns.toSeq ==
      Seq("doc_id", "url"))
  }
}
