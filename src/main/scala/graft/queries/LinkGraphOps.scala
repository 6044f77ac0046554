package graft.queries

import graft.Tables
import graft.ops.{Html, LinkGraph}
import org.apache.spark.sql.functions._

/** Harness entries for the link-graph surface ([[graft.ops.LinkGraph]]).
  *
  * Each doc becomes a page on its own domain (`d<g>.com`, `g = doc_id
  * % 100`) whose anchors endorse two attribute-derived domains
  * (`g·7+11` and `g·13+29` mod 100 — both affine maps are bijections
  * mod 100, so all 100 domains appear on both sides). The pipeline
  * under test is extractLinks → domainEdges → pageRankInt; the oracle
  * rebuilds the edge list from the attribute math alone and, for the
  * rank entry, replays the integer fixed-point recurrence as two
  * unrolled CTE sweeps — any drift in link parsing, rollup, degree
  * math, or the DIV-truncation order breaks the hash.
  */
object LinkGraphOps {
  import Catalog.{Entry, Q}

  /** (url, links) per doc: the page URL plus an anchor list carrying
    * the classic extraction traps (case-shifted scheme/host, a
    * relative link, a mailto:, a quoted non-anchor decoy).
    */
  private def pages(docs: org.apache.spark.sql.DataFrame) = {
    val g = pmod(col("doc_id"), lit(100))
    val d1 = pmod(g * 7 + 11, lit(100)).cast("string")
    val d2 = pmod(g * 13 + 29, lit(100)).cast("string")
    val url = concat(lit("http://www.d"), g.cast("string"),
      lit(".com/p/"), col("doc_id").cast("string"))
    val page = concat(
      lit("<html><body><p>t</p><a class=\"n\" href=\"http://d"), d1,
      lit(".com/a\">A</a> <a href='HTTPS://WWW.D"), d2,
      lit(".com/b'>B</a><a href=\"/rel\">r</a>"),
      lit("<a href=\"mailto:x@y.z\">m</a>"),
      lit("<p href=\"http://decoy.example/\">not an anchor</p>"),
      lit("</body></html>"))
    docs.select(col("doc_id"), url.as("url"),
      Html.extractLinks(page).as("links"))
  }

  /** The oracle's edge CTEs over a `g` column (doc_id % 100). */
  private val oracleEdges =
    """e0 AS (
      |  SELECT 'd' || CAST(g AS VARCHAR) || '.com' AS src,
      |         'd' || CAST((g * 7 + 11) % 100 AS VARCHAR) || '.com' AS dst
      |  FROM d
      |  UNION ALL
      |  SELECT 'd' || CAST(g AS VARCHAR) || '.com',
      |         'd' || CAST((g * 13 + 29) % 100 AS VARCHAR) || '.com'
      |  FROM d)""".stripMargin

  // ---- url_host_graph: the weighted domain edge list.
  private val hostGraph: Q = (s, dir) =>
    LinkGraph.domainEdges(pages(Tables.load(s, dir, "documents")),
      "url", "links")
  private val hostGraphSql =
    s"""WITH d AS (SELECT doc_id % 100 AS g FROM documents),
       |$oracleEdges
       |SELECT src, dst, count(*) AS n_links FROM e0
       |WHERE src <> dst GROUP BY src, dst""".stripMargin

  // ---- url_domain_rank: two integer-PageRank sweeps over the same
  // graph, unrolled in the oracle.
  private val domainRank: Q = (s, dir) =>
    LinkGraph.pageRankInt(
        LinkGraph.domainEdges(pages(Tables.load(s, dir, "documents")),
          "url", "links").select(col("src"), col("dst")),
        iters = 2)
      .select(col("id").as("domain"), col("rank"))
  private val domainRankSql =
    s"""WITH d AS (SELECT doc_id % 100 AS g FROM documents),
       |$oracleEdges,
       |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
       |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
       |p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       |c1 AS (SELECT e.dst AS id, sum(p0.pr // deg.od) AS s
       |       FROM e JOIN deg ON e.src = deg.src JOIN p0 ON p0.id = e.src
       |       GROUP BY e.dst),
       |p1 AS (SELECT n.id,
       |         CAST(150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS pr
       |       FROM nodes n LEFT JOIN c1 ON n.id = c1.id),
       |c2 AS (SELECT e.dst AS id, sum(p1.pr // deg.od) AS s
       |       FROM e JOIN deg ON e.src = deg.src JOIN p1 ON p1.id = e.src
       |       GROUP BY e.dst),
       |p2 AS (SELECT n.id,
       |         CAST(150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS pr
       |       FROM nodes n LEFT JOIN c2 ON n.id = c2.id)
       |SELECT id AS domain, pr AS rank FROM p2""".stripMargin

  // ---- pipeline_rank_sample: the whole centrality-weighted intake
  // under ONE hash — link extraction → domain edges → two PageRank
  // sweeps → docs joined to their domain's rank (broadcast dim) →
  // rank-proportional keep via the integer cross-multiplication draw
  // (P(keep) = rank / 2e6, so base-rank-only domains keep ~7.5% and
  // link-heavy ones keep most of their docs). The oracle replays the
  // full chain: the PR CTEs plus the same BIGINT predicate.
  private val rankSample: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val p = pages(docs)
    val rank = LinkGraph.pageRankInt(
      LinkGraph.domainEdges(p, "url", "links").select(col("src"), col("dst")),
      iters = 2)
    val withDom = p.select(col("doc_id"),
      graft.ops.Urls.registrableDomainOfUrl(col("url")).as("domain"))
    val joined = withDom.join(
      broadcast(rank.withColumnRenamed("id", "domain")), Seq("domain"))
    graft.ops.Sampling.weightedHashSample(joined, "doc_id", "rank",
        unit = 2000000L)
      .select(col("doc_id"), col("domain"), col("rank"))
  }
  private val rankSampleSql =
    s"""WITH d AS (SELECT doc_id % 100 AS g FROM documents),
       |$oracleEdges,
       |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
       |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
       |p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       |c1 AS (SELECT e.dst AS id, sum(p0.pr // deg.od) AS s
       |       FROM e JOIN deg ON e.src = deg.src JOIN p0 ON p0.id = e.src
       |       GROUP BY e.dst),
       |p1 AS (SELECT n.id,
       |         CAST(150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS pr
       |       FROM nodes n LEFT JOIN c1 ON n.id = c1.id),
       |c2 AS (SELECT e.dst AS id, sum(p1.pr // deg.od) AS s
       |       FROM e JOIN deg ON e.src = deg.src JOIN p1 ON p1.id = e.src
       |       GROUP BY e.dst),
       |p2 AS (SELECT n.id,
       |         CAST(150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS pr
       |       FROM nodes n LEFT JOIN c2 ON n.id = c2.id),
       |dd AS (SELECT doc_id, 'd' || CAST(doc_id % 100 AS VARCHAR) || '.com' AS domain
       |       FROM documents)
       |SELECT dd.doc_id, dd.domain, p2.pr AS rank
       |FROM dd JOIN p2 ON p2.id = dd.domain
       |WHERE ('0x' || substr(md5(CAST(dd.doc_id AS VARCHAR)), 1, 8))::BIGINT
       |        * 2000000
       |      < LEAST(p2.pr, 2000000) * 4294967296""".stripMargin

  // ---- url_anchor_stats: anchor-TEXT aggregation per target domain
  // (Html.extractAnchors → registrable-domain rollup) — the retrieval
  // signal a search corpus builds from the link graph. The synthesized
  // anchors carry the extraction traps (inner markup, entities,
  // irregular whitespace, a relative link with no domain, an UNCLOSED
  // anchor that extractLinks would still count); expected text per
  // target is pure attribute math.
  private val anchorStats: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val g = pmod(col("doc_id"), lit(100))
    val d1 = pmod(g * 7 + 11, lit(100)).cast("string")
    val d2 = pmod(g * 13 + 29, lit(100)).cast("string")
    val page = concat(
      lit("<html><body><a href=\"http://d"), d1,
      lit(".com/a\">read <b>more</b> D"), d1, lit("</a>"),
      lit("<a href='HTTPS://WWW.D"), d2,
      lit(".com/b'> visit &amp;  enjoy </a>"),
      lit("<a href=\"/rel\">relative</a>"),
      lit("<a href=\"http://unclosed.example/x\">never closed"),
      lit("</body></html>"))
    val pairs = docs
      .select(explode(graft.ops.Html.extractAnchors(page)).as("p"))
      .select(graft.ops.Urls.registrableDomainOfUrl(col("p.href")).as("domain"),
        col("p.anchor").as("anchor"))
      .filter(col("domain").isNotNull)
    pairs.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_anchors"),
        countDistinct(col("anchor")).as("n_texts"))
  }
  private val anchorStatsSql =
    """WITH d AS (SELECT doc_id % 100 AS g FROM documents),
      |a AS (
      |  SELECT 'd' || CAST((g * 7 + 11) % 100 AS VARCHAR) || '.com' AS domain,
      |         'read more D' || CAST((g * 7 + 11) % 100 AS VARCHAR) AS anchor
      |  FROM d
      |  UNION ALL
      |  SELECT 'd' || CAST((g * 13 + 29) % 100 AS VARCHAR) || '.com',
      |         'visit & enjoy'
      |  FROM d)
      |SELECT domain, count(*) AS n_anchors,
      |  count(DISTINCT anchor) AS n_texts
      |FROM a GROUP BY domain""".stripMargin

  def entries: Seq[Entry] = Seq(
    Entry("url_host_graph", hostGraph, Some(hostGraphSql)),
    Entry("url_domain_rank", domainRank, Some(domainRankSql)),
    Entry("pipeline_rank_sample", rankSample, Some(rankSampleSql)),
    Entry("url_anchor_stats", anchorStats, Some(anchorStatsSql)),
  )
}
