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

  test("capPerDomain keeps `cap` per registrable domain, all no-domain rows, and honors orderBy") {
    val df = Seq(
      (1L, "http://a.site.com/1", 5L),
      (2L, "http://b.site.com/2", 9L),   // same domain as 1/3 via rollup
      (3L, "http://site.com/3", 7L),
      (4L, "http://other.org/4", 1L),
      (5L, "garbage", 0L),
      (6L, "also garbage", 0L),
      (7L, "still garbage", 0L))
      .toDF("doc_id", "url", "quality")
    // cap=2 by id: site.com keeps ids 1,2; other.org keeps 4; all three
    // unparseable rows survive (no identity to cap on)
    val byId = Urls.capPerDomain(df, "doc_id", "url", cap = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(byId == Seq(1L, 2L, 4L, 5L, 6L, 7L))
    // quality-descending order flips the site.com winners to 2,3
    val byQ = Urls.capPerDomain(df, "doc_id", "url", cap = 2,
        orderBy = Seq(col("quality").desc))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(byQ == Seq(2L, 3L, 4L, 5L, 6L, 7L))
    // schema passes through
    assert(Urls.capPerDomain(df, "doc_id", "url", 1).columns.toSeq ==
      Seq("doc_id", "url", "quality"))
    assertThrows[IllegalArgumentException](
      Urls.capPerDomain(df, "doc_id", "url", 0))
  }

  test("native registrableDomainOfUrl equals the column chain on adversarial URLs") {
    val urls = Seq(
      "http://a.site.com/1", "HTTPS://WWW.Site2.COM:443/y?q=1#f",
      "http://u:p@blog.news.co.uk:80/x", "https://x.y.z.com.au/",
      "http://www.co.uk", "http://host", "http://host.", "http://.host",
      "http://a..b.com/z", "ftp://files.example.com/f", "no scheme here",
      "://nohost", "http://", "http://@", "http://www.", "1http://bad.com",
      "http://HOST.ORG:443/keeps-port", "https://h.org:80/keeps-port",
      "http://a@b@c.example.org/multi-at", "http://www.www.example.com",
      "", "http://xn--bcher-kva.example/idn")
    val df = (urls.map(Option(_)) :+ None).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val got = df.select($"id",
        Urls.registrableDomainOfUrl($"url").as("native"),
        Urls.registrableDomain(Urls.hostOf($"url")).as("chain"))
      .collect()
    got.foreach { r =>
      assert(Option(r.getString(1)) == Option(r.getString(2)),
        s"url=${urls.lift(r.getLong(0).toInt)} native=${r.getString(1)} chain=${r.getString(2)}")
    }
  }

  test("filterBlockedDomains drops by registrable domain, case-insensitively, keeping no-domain rows") {
    val df = Seq(
      (1L, "http://a.b.site2.com/x"),  // subdomain rolls up to site2.com
      (2L, "https://WWW.Site2.COM/y"), // case + www
      (3L, "http://site3.com/z"),
      (4L, "not a url"))
      .toDF("doc_id", "url")
    val blocked = Seq("Site2.COM", "dead.example").toDF("domain")
    val kept = Urls.filterBlockedDomains(df, "url", blocked)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L))
    assertThrows[IllegalArgumentException](
      Urls.filterBlockedDomains(df, "url", blocked.toDF("host")))
  }

  test("urlQualitySignals: hand-computed signals and keep decisions") {
    val cfg = Urls.UrlQualityConfig(maxPathDepth = 3, maxParams = 2,
      maxHostDigitPermille = 300, maxUrlLen = 60,
      blockedWords = Seq("casino"))
    val rows = Seq(
      (1L, "https://site.com/a/b?x=1"),       // clean → keep
      (2L, "https://site.com/a/b/c/d?x=1"),   // depth 4 > 3 → drop
      (3L, "https://site.com/a?x=1&y=2&z=3"), // 3 params > 2 → drop
      (4L, "https://42424242.site.com/a"),    // 8000/17 = 470‰ > 300 → drop
      (5L, "https://site.com/go/casino"),     // blocked word → drop
      (6L, "not a url"))                      // unparseable → drop, null signals
      .toDF("id", "url")
    val got = Urls.urlQualitySignals(rows, "url", cfg)
      .select($"id", $"path_depth", $"n_params", $"host_digit_permille",
        $"url_len", $"has_blocked_word", $"url_keep")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getInt(4), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(got(1L) == ((Some(2), Some(1), Some(0L), 24, false, true)))
    assert(got(2L) == ((Some(4), Some(1), Some(0L), 28, false, false)))
    assert(got(3L) == ((Some(1), Some(3), Some(0L), 30, false, false)))
    assert(got(4L) == ((Some(1), Some(0), Some(470L), 27, false, false)))
    assert(got(5L) == ((Some(2), Some(0), Some(0L), 26, true, false)))
    assert(got(6L) == ((None, None, None, 9, false, false)))
  }

  test("urlQualitySignals: digit ratio reads the CANONICAL host; tracking params still count") {
    val cfg = Urls.UrlQualityConfig(maxHostDigitPermille = 300, maxParams = 1)
    // userinfo digits and the default port must not inflate the ratio:
    // canonical host is 42.example.com (2 digits / 14 chars = 142‰ ≤ 300)
    // — counting '1234:p@' or ':80' would push it past the threshold.
    val rows = Seq(
      (1L, "http://1234:p@www.42.example.com:80/x"),
      (2L, "https://site.com/x?utm_source=t&a=1")) // 2 params incl. tracking → drop
      .toDF("id", "url")
    val got = Urls.urlQualitySignals(rows, "url", cfg)
      .select($"id", $"host_digit_permille", $"n_params", $"url_keep")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getBoolean(3)))
      .toMap
    assert(got(1L) == ((142L, 0, true)))
    assert(got(2L) == ((0L, 2, false)))
    assertThrows[IllegalArgumentException](
      Urls.UrlQualityConfig(blockedWords = Seq("Casino")))
    assertThrows[IllegalArgumentException](
      Urls.UrlQualityConfig(maxHostDigitPermille = 1500))
  }

  test("urlQualitySignals: a '?' inside the fragment is not a query (hash-routed SPA URLs)") {
    val cfg = Urls.UrlQualityConfig(maxParams = 2)
    val rows = Seq(
      (1L, "https://app.com/page#/search?a=1&b=2&c=3&d=4"), // fragment only → 0 params
      (2L, "https://app.com/p?x=1#frag?y=2&z=3"))           // real query: 1 param
      .toDF("id", "url")
    val got = Urls.urlQualitySignals(rows, "url", cfg)
      .select($"id", $"n_params", $"url_keep")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(got == Map(1L -> ((0, true)), 2L -> ((1, true))))
  }
}
