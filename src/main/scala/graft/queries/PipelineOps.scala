package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Composed end-to-end pipeline queries — the "whole workflow" proof
  * that the individual operators compose into one declarative plan
  * Catalyst can optimize across stage boundaries (filters stay before
  * the dedup shuffle; redaction pays only for survivors).
  */
object PipelineOps {
  import Catalog.{Entry, Q}

  // pipeline_corpus_prep — ops.CorpusPrep over the corpus: language
  // filter → token-count + stopword-ratio quality filter → exact dedup
  // (keep smallest doc_id) → PII redaction, one plan. The raw corpus
  // has no exact duplicates, so the query UNIONs in re-keyed copies of
  // every 10th document (identically in the oracle); all 50 injected
  // copies must die in the dedup stage — keep-min-id is observable in
  // the hash.
  private val corpusPrep: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val withDupes = docs.unionByName(
      docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(10000L)))
    graft.ops.CorpusPrep.prepare(withDupes, "doc_id", "text",
      keepLang = "en", minTokens = 40, maxTokens = 120, maxStopwordRatio = 0.6)
      .select(col("doc_id"), col("text"), col("source"))
  }

  private val corpusPrepSql =
    """WITH corpus AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, text, source FROM documents WHERE doc_id % 10 = 0),
      |scored AS (
      |  SELECT doc_id, text, source,
      |    CASE WHEN trim(text) = '' THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
      |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |        t -> t IN ('the','a','of','and'))) AS s_en,
      |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |        t -> t IN ('der','und','die','das'))) AS s_de,
      |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |        t -> t IN ('le','la','et','les'))) AS s_fr
      |  FROM corpus),
      |filtered AS (
      |  SELECT doc_id, text, source, n_tok FROM scored
      |  WHERE CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
      |             WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
      |             WHEN s_fr > 0 THEN 'fr' ELSE 'und' END = 'en'
      |    AND n_tok BETWEEN 40 AND 120
      |    AND (CASE WHEN n_tok > 0 THEN CAST(s_en AS DOUBLE) / n_tok
      |              ELSE 0.0 END) <= 0.6),
      |kept AS (
      |  SELECT doc_id, text, source, row_number() OVER (
      |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |    ORDER BY doc_id) AS rn
      |  FROM filtered)
      |SELECT doc_id,
      |  regexp_replace(regexp_replace(regexp_replace(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
      |    '\b[0-9]{3}-([0-9]{3}-)?[0-9]{4}\b', '<PHONE>', 'g') AS text,
      |  source
      |FROM kept WHERE rn = 1""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("pipeline_corpus_prep", corpusPrep, Some(corpusPrepSql)))
}
