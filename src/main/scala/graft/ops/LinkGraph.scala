package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web link-graph curation: turn pages' outgoing anchors into a
  * registrable-domain graph and score domains by link centrality —
  * the RefinedWeb/Common-Crawl-ranking signal that weights a corpus
  * toward well-linked sites and starves link farms. Composes with
  * [[Html.extractLinks]] upstream and joins back onto
  * [[Urls.registrableDomain]] rollups downstream.
  *
  * Centrality here is PageRank in INTEGER fixed point (rank mass in
  * `unit`-scaled longs, damping as a percentage, truncating division
  * everywhere) — the same engine-stable score-algebra stance as the
  * LM/quality operators: float summation order varies with
  * partitioning, integer math does not, so ranks are reproducible
  * across engines and cluster layouts bit for bit.
  */
object LinkGraph {

  /** Domain-level edges from per-page outgoing links: one row per
    * (src_domain, dst_domain) with the link count. `linksCol` is an
    * array of raw hrefs ([[Html.extractLinks]] output); only absolute
    * http(s) targets count (relative links stay within the src domain
    * and carry no cross-site endorsement), domains roll up via
    * [[Urls.registrableDomain]], self-edges drop (intra-site links
    * are navigation, not endorsement), and rows whose src URL or link
    * has no registrable domain drop with them.
    *
    * Shape: explode → row-local domain algebra → one count aggregate.
    * The exchange carries (domain, domain) pairs — never URLs, HTML,
    * or link text.
    */
  def domainEdges(df: DataFrame, urlCol: String, linksCol: String): DataFrame = {
    // Domains via the NATIVE expression, not the column chain: the
    // whole post-explode pipeline lands inside the Generate consume
    // function, which gets neither subexpression elimination nor
    // method splitting — the five-regex chain's self-references
    // re-expand there and blew janino's 64 KB limit (round-8 codegen
    // audit; the staged-projection fix that works for join keys does
    // not survive CollapseProject here). One static call per side is
    // immune by construction — and one char-walk instead of five
    // regex executions per link.
    df.select(Urls.registrableDomainOfUrl(col(urlCol)).as("src"),
        explode(col(linksCol)).as("__link"))
      .filter(col("__link").rlike("^(?i)https?://"))
      .select(col("src"), Urls.registrableDomainOfUrl(col("__link")).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n_links"))
  }

  /** PageRank over (src, dst) edges in integer fixed point:
    * every node starts at `unit`; each of `iters` sweeps sets
    *
    *   rank(n) = base + dampingPct · Σ_{(m,n)∈E} (rank(m) DIV out(m)) DIV 100
    *
    * with `base = unit·(100−dampingPct)/100` computed once on the
    * driver. All arithmetic is long + truncating division — replayable
    * verbatim in any SQL engine, stable under any partitioning.
    * Output: one row per node, (id, rank).
    *
    * Semantics notes, all deliberate:
    *  - edges are DISTINCT'd and self-loops dropped — multiplicity is
    *    [[domainEdges]]'s `n_links` business, endorsement is binary;
    *  - dangling nodes (no out-edges) leak their damped mass instead
    *    of redistributing it — the standard simplification; ranks
    *    remain a consistent relative ordering, which is all a
    *    curation weight needs;
    *  - fixed `iters`, no convergence test: deterministic cost and a
    *    deterministic answer (centrality for curation wants ~5-10
    *    sweeps, not fixed-point convergence).
    *
    * Scale shape: per sweep, one hash join of edges⋈ranks on src and
    * one sum-by-dst — both shuffle (node, long) pairs only. Each
    * sweep is eagerly localCheckpoint'ed, the same lineage-truncation
    * discipline as [[Dedup.connectedComponents]]' label propagation
    * (on a real cluster: a reliable checkpoint dir). Rank overflow is
    * structurally impossible below ~10¹¹ nodes at the default unit:
    * any node's in-contribution sum is bounded by the total mass
    * nodes·unit, and dampingPct·mass must stay under 2⁶³ —
    * 85 · 10¹¹ · 10⁶ ≈ 8.5·10¹⁸ < 2⁶³. (Domain-level web graphs are
    * ~10⁸; shrink `unit` if you ever rank page-level graphs beyond
    * 10¹¹ nodes.)
    */
  def pageRankInt(edges: DataFrame, iters: Int, dampingPct: Int = 85,
      unit: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(dampingPct >= 1 && dampingPct <= 99,
      s"dampingPct must be in [1, 99], got $dampingPct")
    require(unit >= 100L, s"unit must be at least 100, got $unit")
    require(edges.columns.contains("src") && edges.columns.contains("dst"),
      s"pageRankInt needs (src, dst) columns, got [${edges.columns.mkString(", ")}]")
    val base = unit * (100 - dampingPct) / 100

    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__od"))
    // (src, dst, out-degree), materialized once and reused every sweep.
    val ed = e.join(deg, Seq("src")).localCheckpoint(true)
    val nodes = ed.select(col("src").as("id"))
      .union(ed.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)

    var rank = nodes.withColumn("rank", lit(unit))
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(rank.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), expr("rank DIV __od").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      rank = nodes
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) +
            expr(s"($dampingPct * coalesce(__s, 0L)) DIV 100")).as("rank"))
        .localCheckpoint(true)
    }
    rank
  }
}
