package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Grouping / assembly-shaped operators (SURVEY.md §2.5, G1–G6) in
  * oracle-checkable form. The real per-patient document assembly (the
  * groupByKey → Aggregator fold, G1/G2 + collectors) lives in
  * `graft.collect`; these queries verify the aggregation semantics the
  * assembly relies on: grouped value collection, single-multiplicity
  * guards and distinct-pair counting. All use partial-aggregable
  * shapes (collect_set is bounded per key here; at 100 TB per-key
  * cardinality stays document-sized, not data-sized).
  */
object GroupingOps {
  import Catalog.{Entry, Q}

  // G3 — group_column_by_subject_id: per-key ordered value collection
  // (contextualized_data_frame.rs:129-157). Emitted as a sorted joined
  // string so the oracle hash is stable.
  private val g3: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(array_join(array_sort(collect_set(col("l_returnflag"))), ",").as("flags"))
  private val g3Sql =
    """SELECT l_orderkey,
      |  string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS flags
      |FROM lineitem GROUP BY l_orderkey""".stripMargin

  // G4 — single-multiplicity element: distinct-with-cardinality-guard
  // (collecting/utils.rs:29-72): 0 → null, 1 → the value, >1 → flagged
  // (the collector raises; here the flag is emitted for the oracle).
  // countDistinct plans as TWO exchanges (partial by (key, value),
  // re-shuffle by key); a bounded collect_set is ONE exchange carrying
  // partially-merged sets — size-safe because per-order distinct
  // suppkeys are line-count-bounded (≤ 7), document-sized state, not
  // data-sized. size() is INT, cast back to countDistinct's BIGINT.
  private val g4: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(size(collect_set(col("l_suppkey"))).cast("long").as("n_supp"))
      .select(col("l_orderkey"), col("n_supp"),
        (col("n_supp") === 1).as("is_single"))
  private val g4Sql =
    """SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
      |  count(DISTINCT l_suppkey) = 1 AS is_single
      |FROM lineitem GROUP BY l_orderkey""".stripMargin

  // G5 — distinct (observation, onset)-style pair sets per key
  // (hpo_in_header_collector.rs:43-78): pair cardinality per group.
  // distinct-then-count re-shuffled the deduped rows a second time
  // (exchange by (key, flag, status), then by key); one bounded
  // collect_set of the pair struct is a single key-partitioned
  // exchange — per-order pair cardinality is capped by
  // |returnflag| × |linestatus| (= 6), so the set state is constant-
  // sized. struct() is never null, so rows with null members survive
  // exactly as distinct() kept them; cast restores count()'s BIGINT.
  private val g5: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(size(collect_set(struct(col("l_returnflag"), col("l_linestatus"))))
        .cast("long").as("n_pairs"))
  private val g5Sql =
    """SELECT l_orderkey, count(*) AS n_pairs FROM (
      |  SELECT DISTINCT l_orderkey, l_returnflag, l_linestatus FROM lineitem) t
      |GROUP BY l_orderkey""".stripMargin

  // CDC changelog compaction (ops.Changelog): orders replayed as a
  // per-customer update log — o_orderkey is the (unique) sequence,
  // the latest order's status decides deletion ('F' → customer gone).
  // Oracle is the row_number-top-1 formulation, equivalent because the
  // sequence is unique per id.
  private val cdc: Q = (s, dir) =>
    graft.ops.Changelog.compact(
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          when(col("o_orderstatus") === "F", lit("D")).otherwise(lit("U")).as("op"),
          col("o_totalprice"), col("o_orderpriority")),
      idCol = "o_custkey", seqCol = "o_orderkey", opCol = "op",
      payload = Seq("o_totalprice", "o_orderpriority"))
  private val cdcSql =
    """SELECT o_custkey, o_totalprice, o_orderpriority FROM (
      |  SELECT o_custkey, o_totalprice, o_orderpriority,
      |    CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
      |  FROM orders) t
      |WHERE rn = 1 AND op <> 'D'""".stripMargin

  // Snapshot diff (ops.Changelog.snapshotDiff): two synthetic corpus
  // versions derived from documents — v_old drops doc_id % 7 == 0,
  // v_new drops doc_id % 5 == 0 and rewrites text for doc_id % 3 == 0
  // — classified added/removed/changed/unchanged on digests only.
  private val diff: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val vOld = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("text"), col("lang"))
    val vNew = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"),
        col("lang"))
    graft.ops.Changelog.snapshotDiff(vOld, vNew, "doc_id", Seq("text", "lang"))
  }
  private val diffSql =
    """WITH v_old AS (
      |  SELECT doc_id,
      |    md5(md5(coalesce(text, '')) || md5(coalesce(lang, ''))) AS fp
      |  FROM documents WHERE doc_id % 7 <> 0),
      |v_new AS (
      |  SELECT doc_id, md5(
      |    md5(coalesce(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END, ''))
      |    || md5(coalesce(lang, ''))) AS fp
      |  FROM documents WHERE doc_id % 5 <> 0)
      |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN o.fp IS NULL THEN 'added'
      |       WHEN n.fp IS NULL THEN 'removed'
      |       WHEN o.fp <> n.fp THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM v_old o FULL OUTER JOIN v_new n ON o.doc_id = n.doc_id""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("g3_collect_by_key", g3, Some(g3Sql)),
    Entry("g4_single_multiplicity", g4, Some(g4Sql)),
    Entry("g5_distinct_pairs", g5, Some(g5Sql)),
    Entry("g6_cdc_compact", cdc, Some(cdcSql)),
    Entry("q_snapshot_diff", diff, Some(diffSql)),
  )
}
