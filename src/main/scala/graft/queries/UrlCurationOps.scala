package graft.queries

import graft.Tables
import graft.ops.{Robots, Urls}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Harness entries for the URL-curation surface ([[graft.ops.Urls]]).
  *
  * URLs are SYNTHESIZED deterministically from doc attributes, messy on
  * purpose: upper-cased schemes/hosts, `www.` prefixes, default ports,
  * userinfo, trailing slashes, tracking parameters, shuffled parameter
  * order, fragments. The canonical identity derives from
  * `g = doc_id % 100` only; all the noise derives from `doc_id` — so
  * normalization must collapse every group-g URL to ONE canonical
  * string. The oracles derive the expected canonical/domain/winner
  * INDEPENDENTLY from the attribute math (never by re-running the
  * normalizer) — any rule the normalizer gets wrong breaks the hash.
  */
object UrlCurationOps {
  import Catalog.{Entry, Q}

  /** The messy synthesized URL column (over a `doc_id` column). */
  private def synthUrl = {
    val id = col("doc_id")
    val g = pmod(id, lit(100))
    val schemeC = when(pmod(g, lit(2)) === 0, lit("http")).otherwise(lit("https"))
    val scheme = when(pmod(id, lit(3)) === 0, upper(schemeC)).otherwise(schemeC)
    val sub = when(pmod(g, lit(5)) === 0, lit("blog.")).otherwise(lit(""))
    val tld = when(pmod(g, lit(4)) === 0, lit("com"))
      .when(pmod(g, lit(4)) === 1, lit("org"))
      .when(pmod(g, lit(4)) === 2, lit("co.uk"))
      .otherwise(lit("com.au"))
    val hostC = concat(sub, lit("site"), pmod(g, lit(25)).cast("string"),
      lit("."), tld)
    val www = when(pmod(id, lit(3)) === 1, lit("www.")).otherwise(lit(""))
    val hostShown = when(pmod(id, lit(7)) === 0, upper(concat(www, hostC)))
      .otherwise(concat(www, hostC))
    val port = when(schemeC === "http" && pmod(id, lit(5)) === 0, lit(":80"))
      .when(schemeC === "https" && pmod(id, lit(5)) === 1, lit(":443"))
      .otherwise(lit(""))
    val user = when(pmod(id, lit(11)) === 0, lit("u:p@")).otherwise(lit(""))
    val path = concat(lit("/p/"), pmod(g, lit(17)).cast("string"),
      when(pmod(id, lit(2)) === 1, lit("/")).otherwise(lit("")))
    val baseQ = concat(lit("id="), g.cast("string"))
    val withB = pmod(g, lit(3)) === 0
    val track = when(pmod(id, lit(2)) === 0, lit("&utm_source=x")).otherwise(lit(""))
    val qstr = when(withB && pmod(id, lit(3)) === 2,
        concat(lit("?b=2&"), baseQ, track))
      .when(withB, concat(lit("?"), baseQ, lit("&b=2"), track))
      .otherwise(concat(lit("?"), baseQ, track))
    val frag = when(pmod(id, lit(4)) === 0,
      concat(lit("#s"), id.cast("string"))).otherwise(lit(""))
    concat(scheme, lit("://"), user, hostShown, port, path, qstr, frag)
  }

  /** The oracle's independent attribute-math derivation of the same
    * canonical URL / registrable domain (DuckDB SQL fragmentS over a
    * `doc_id` column; `g` must be selected as `doc_id % 100`).
    */
  private val oracleCanonical =
    """(CASE WHEN g % 2 = 0 THEN 'http' ELSE 'https' END) || '://'
      | || (CASE WHEN g % 5 = 0 THEN 'blog.' ELSE '' END)
      | || 'site' || CAST(g % 25 AS VARCHAR) || '.'
      | || (CASE g % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |               WHEN 2 THEN 'co.uk' ELSE 'com.au' END)
      | || '/p/' || CAST(g % 17 AS VARCHAR)
      | || '?' || (CASE WHEN g % 3 = 0 THEN 'b=2&id=' || CAST(g AS VARCHAR)
      |                 ELSE 'id=' || CAST(g AS VARCHAR) END)""".stripMargin
      // flattened: these fragments interpolate into OUTER stripMargin
      // strings, whose margin strip would otherwise eat one pipe of a
      // line-leading '||'
      .linesIterator.mkString(" ")

  private val oracleDomain =
    """'site' || CAST(g % 25 AS VARCHAR) || '.'
      | || (CASE g % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |               WHEN 2 THEN 'co.uk' ELSE 'com.au' END)""".stripMargin
      .linesIterator.mkString(" ")

  // ---- url_normalize: every messy variant collapses to the attribute
  // canonical; the registrable domain drops subdomains but keeps
  // multi-part public suffixes.
  private val normalize: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    docs.select(col("doc_id"), synthUrl.as("__u"))
      .select(col("doc_id"),
        Urls.normalizeUrl(col("__u")).as("url_canon"),
        Urls.registrableDomain(Urls.hostOf(col("__u"))).as("domain"))
  }
  private val normalizeSql =
    s"""WITH d AS (SELECT doc_id, doc_id % 100 AS g FROM documents)
       |SELECT doc_id, $oracleCanonical AS url_canon, $oracleDomain AS domain
       |FROM d""".stripMargin

  // ---- url_dedup: one winner (min doc_id) per canonical URL.
  private val dedup: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    Urls.dedupByUrl(docs.select(col("doc_id"), synthUrl.as("url")),
        "doc_id", "url")
      .select(col("doc_id"))
  }
  private val dedupSql =
    s"""WITH d AS (SELECT doc_id, doc_id % 100 AS g FROM documents),
       |c AS (SELECT doc_id, $oracleCanonical AS canon FROM d)
       |SELECT min(doc_id) AS doc_id FROM c GROUP BY canon""".stripMargin

  // ---- url_domain_stats: per registrable domain, docs and distinct
  // canonical pages — the rollup a domain-level quality decision reads.
  private val domainStats: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    docs.select(col("doc_id"), synthUrl.as("__u"))
      .select(
        Urls.registrableDomain(Urls.hostOf(col("__u"))).as("domain"),
        Urls.normalizeUrl(col("__u")).as("__c"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__c")).as("n_pages"))
  }
  private val domainStatsSql =
    s"""WITH d AS (SELECT doc_id, doc_id % 100 AS g FROM documents),
       |c AS (SELECT doc_id, $oracleDomain AS domain, $oracleCanonical AS canon FROM d)
       |SELECT domain, count(*) AS n_docs, count(DISTINCT canon) AS n_pages
       |FROM c GROUP BY domain""".stripMargin

  // ---- url_domain_cap: RefinedWeb-style per-domain volume cap — at
  // most 10 docs (smallest doc_id) per registrable domain. The synth
  // URLs give 100 distinct domains, each holding every doc with the
  // matching doc_id % 100 residue class, so at sf0.01 the cap truly
  // bites on every domain.
  private val domainCap: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    Urls.capPerDomain(docs.select(col("doc_id"), synthUrl.as("url")),
        "doc_id", "url", cap = 10)
      .select(col("doc_id"))
  }
  private val domainCapSql =
    s"""WITH d AS (SELECT doc_id, doc_id % 100 AS g FROM documents),
       |c AS (SELECT doc_id, $oracleDomain AS domain FROM d),
       |r AS (SELECT doc_id, row_number() OVER
       |        (PARTITION BY domain ORDER BY doc_id) AS rk FROM c)
       |SELECT doc_id FROM r WHERE rk <= 10""".stripMargin

  /** A reduced-noise synth URL with the SAME host identity math as
    * [[synthUrl]] (so [[oracleDomain]] applies verbatim) but none of
    * the canonicalization noise (scheme case, ports, userinfo, query,
    * fragments). The blocklist entry exercises domain rollup + the
    * broadcast anti-join, not canonicalization — and the FULL synth
    * expression inlined into the join key blew janino's 64 KB method
    * limit, silently knocking the whole stage to interpreted eval
    * (the anti-join key cannot be method-split the way a plain
    * projection can).
    */
  private def synthUrlHostOnly = {
    val id = col("doc_id")
    val g = pmod(id, lit(100))
    val sub = when(pmod(g, lit(5)) === 0, lit("blog.")).otherwise(lit(""))
    val tld = when(pmod(g, lit(4)) === 0, lit("com"))
      .when(pmod(g, lit(4)) === 1, lit("org"))
      .when(pmod(g, lit(4)) === 2, lit("co.uk"))
      .otherwise(lit("com.au"))
    val hostC = concat(sub, lit("site"), pmod(g, lit(25)).cast("string"),
      lit("."), tld)
    val www = when(pmod(id, lit(3)) === 1, lit("www.")).otherwise(lit(""))
    val host = when(pmod(id, lit(7)) === 0, upper(concat(www, hostC)))
      .otherwise(concat(www, hostC))
    concat(lit("http://"), host, lit("/p/"), id.cast("string"))
  }

  // ---- url_blocklist: domain-level deny list (a config-sized input
  // shared verbatim with the oracle, like any dimension table); the
  // four real entries each hit one synthesized domain family.
  private val blockedDomains = Seq(
    "site3.co.uk", "site7.com", "site11.org", "site19.com.au",
    "missing.example")
  private val blocklist: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    Urls.filterBlockedDomains(
        docs.select(col("doc_id"), synthUrlHostOnly.as("url")), "url",
        blockedDomains.toDF("domain"))
      .select(col("doc_id"))
  }
  private val blocklistSql =
    s"""WITH d AS (SELECT doc_id, doc_id % 100 AS g FROM documents),
       |c AS (SELECT doc_id, $oracleDomain AS domain FROM d)
       |SELECT doc_id FROM c WHERE domain NOT IN
       |  (${blockedDomains.map(b => s"'$b'").mkString(", ")})""".stripMargin

  /** A second synthesized URL family for the URL-SHAPE quality
    * heuristics ([[Urls.urlQualitySignals]]): spam markers derive from
    * `g = doc_id % 100` by pure integer math —
    *
    *  - `g % 6 == 0` → a digit-heavy `42424242.` subdomain (8 digits);
    *  - path depth `g % 9` of 2-char `/s` segments, plus `/casino`
    *    (depth +1 AND the blocked word) when `g % 13 == 0`;
    *  - `g % 7` query parameters (4 chars each incl. separator).
    *
    * The oracle derives every signal (depth, params, digit permille,
    * total length, keep) from that attribute math alone — it never
    * re-runs any string rule, so a parsing bug on the Spark side
    * cannot cancel out.
    */
  /** The shared attribute-math tld / plain host of the quality and
    * robots synth families. `url_robots` JOINS the url host against
    * [[robotsTable]]'s host as strings — one definition, so the two
    * sides cannot drift apart (a one-sided edit would silently turn
    * every affected URL into the default-allow verdict).
    */
  private def synthTld(g: Column) = when(pmod(g, lit(4)) === 0, lit("com"))
    .when(pmod(g, lit(4)) === 1, lit("org"))
    .when(pmod(g, lit(4)) === 2, lit("co.uk"))
    .otherwise(lit("com.au"))
  private def synthPlainHost(g: Column) =
    concat(lit("site"), pmod(g, lit(25)).cast("string"), lit("."), synthTld(g))

  private def synthQualityUrl = {
    val id = col("doc_id")
    val g = pmod(id, lit(100))
    val host = concat(
      when(pmod(g, lit(6)) === 0, lit("42424242.")).otherwise(lit("")),
      synthPlainHost(g))
    val path = lit("/s/s/s/s/s/s/s/s")
      .substr(lit(1), (pmod(g, lit(9)) * 2).cast("int"))
    val casino = when(pmod(g, lit(13)) === 0, lit("/casino")).otherwise(lit(""))
    val np = pmod(g, lit(7))
    val qstr = when(np > 0,
      concat(lit("?"), lit("a=1&b=1&c=1&d=1&e=1&f=1")
        .substr(lit(1), (np * 4 - 1).cast("int")))).otherwise(lit(""))
    concat(lit("https://"), host, path, casino, qstr)
  }

  private val quality: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    Urls.urlQualitySignals(
        docs.select(col("doc_id"), synthQualityUrl.as("url")),
        "url", Urls.UrlQualityConfig(maxUrlLen = 50))
      .select(col("doc_id"),
        col("path_depth").cast("long").as("path_depth"),
        col("n_params").cast("long").as("n_params"),
        col("host_digit_permille"),
        col("url_len").cast("long").as("url_len"),
        col("has_blocked_word"), col("url_keep"))
  }
  private val qualitySql =
    """WITH d AS (SELECT doc_id, doc_id % 100 AS g FROM documents),
      |s AS (SELECT doc_id,
      |  CASE WHEN g % 25 < 10 THEN 1 ELSE 2 END AS dlen,
      |  CASE g % 4 WHEN 0 THEN 3 WHEN 1 THEN 3 WHEN 2 THEN 5 ELSE 6 END AS tldlen,
      |  CASE WHEN g % 6 = 0 THEN 1 ELSE 0 END AS spam,
      |  g % 9 AS depth0, g % 7 AS np,
      |  CASE WHEN g % 13 = 0 THEN 1 ELSE 0 END AS casino
      | FROM d),
      |t AS (SELECT doc_id,
      |  spam * 8 + dlen AS digits,
      |  spam * 9 + 5 + dlen + tldlen AS hostlen,
      |  depth0 + casino AS depth, np, casino,
      |  8 + spam * 9 + 5 + dlen + tldlen + 2 * depth0 + casino * 7 + 4 * np AS ulen
      | FROM s)
      |SELECT doc_id,
      |  CAST(depth AS BIGINT) AS path_depth,
      |  CAST(np AS BIGINT) AS n_params,
      |  CAST(floor(digits * 1000.0 / hostlen) AS BIGINT) AS host_digit_permille,
      |  CAST(ulen AS BIGINT) AS url_len,
      |  casino = 1 AS has_blocked_word,
      |  (depth <= 6 AND np <= 4 AND digits * 1000 <= hostlen * 300
      |    AND ulen <= 50 AND casino = 0) AS url_keep
      |FROM t""".stripMargin

  // ---- url_robots: RFC 9309 robots.txt exclusion
  // (graft.ops.Robots). One synthesized robots body per host, with the
  // rule SHAPE keyed by host attribute math: an `evilbot` group that
  // must never apply, a `graftbot` group on even-g hosts (so group
  // selection, not just rule matching, decides half the corpus), and a
  // `*` group cycling prefix / `$`-anchored / Allow-overrides-Disallow
  // rules. URL paths are depth `g % 9`. The oracle derives each
  // verdict purely from (g % 2, g % 3, g % 9) — a parser that unions
  // groups, ignores the anchor, or breaks longest-match-wins flips
  // verdicts and breaks the hash.
  private def robotsTable(s: org.apache.spark.sql.SparkSession) = {
    val g = col("id")
    val host = synthPlainHost(g)
    val m3 = pmod(g, lit(3))
    val star = concat(lit("User-agent: *\n"),
      when(m3 === 0, lit("Disallow: /s\n"))
        .when(m3 === 1, lit("Disallow: /s$\n"))
        .otherwise(lit("Allow: /s/s\nDisallow: /s\n")))
    val body = concat(
      lit("# synthetic robots\nUser-agent: evilbot\nDisallow: /\n\n"),
      when(pmod(g, lit(2)) === 0,
        lit("User-agent: graftbot\nDisallow: /x\n\n")).otherwise(lit("")),
      star)
    s.range(0, 100).select(host.as("host"), body.as("robots"))
  }

  private val robots: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val g = pmod(col("doc_id"), lit(100))
    val url = concat(lit("https://"), synthPlainHost(g),
      lit("/s/s/s/s/s/s/s/s").substr(lit(1), (pmod(g, lit(9)) * 2).cast("int")))
    Robots.robotsDecisions(
      docs.select(col("doc_id"), url.as("url")), "doc_id", "url",
      robotsTable(s), "host", "robots", userAgent = "GraftBot/1.0")
  }
  private val robotsSql =
    """WITH d AS (SELECT doc_id, doc_id % 100 AS g FROM documents)
      |SELECT doc_id,
      |  CASE WHEN g % 2 = 0 THEN true
      |       WHEN g % 3 = 0 THEN g % 9 = 0
      |       ELSE g % 9 <> 1 END AS allowed
      |FROM d""".stripMargin

  def entries: Seq[Entry] = Seq(
    Entry("url_normalize", normalize, Some(normalizeSql)),
    Entry("url_dedup", dedup, Some(dedupSql)),
    Entry("url_domain_stats", domainStats, Some(domainStatsSql)),
    Entry("url_domain_cap", domainCap, Some(domainCapSql)),
    Entry("url_blocklist", blocklist, Some(blocklistSql)),
    Entry("url_quality", quality, Some(qualitySql)),
    Entry("url_robots", robots, Some(robotsSql)),
  )
}
