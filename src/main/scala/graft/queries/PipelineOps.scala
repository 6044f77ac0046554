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
      |         ELSE len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) END AS n_tok,
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

  // pipeline_curriculum_mix — the rest of the training-data workflow
  // on top of the prepared corpus: per-source length-quartile binning
  // (ops.Binning — histogram-located boundaries, no per-source sort)
  // and curriculum-weighted mixing keyed by the bin (ops.Mixture —
  // top quartile upsampled 2×, bottom quartile dropped). The oracle
  // reuses the prep SQL verbatim as a nested CTE, then mirrors the
  // boundary/bin/epoch math.
  private val curriculumMix: Q = (s, dir) => {
    val prepped = corpusPrep(s, dir)
      .withColumn("n_len", length(col("text")).cast("long"))
    val binned = graft.ops.Binning.quantileBins(
      prepped, "source", "n_len", Seq("doc_id"), bins = 4)
      .withColumn("bin", col("bin").cast("string"))
    graft.ops.Mixture.mixCorpora(binned, "doc_id", "bin",
      weights = Map("3" -> 2.0, "2" -> 1.0, "1" -> 0.5), defaultWeight = 0.0)
      .select(col("doc_id"), col("source"), col("bin"), col("epoch"))
  }
  private val curriculumMixSql = {
    import graft.ops.Sampling.hexThreshold
    s"""WITH prepped AS ($corpusPrepSql),
       |lenned AS (
       |  SELECT doc_id, source, CAST(len(text) AS BIGINT) AS n_len FROM prepped),
       |ranked AS (
       |  SELECT doc_id, source, n_len,
       |    row_number() OVER (PARTITION BY source ORDER BY n_len, doc_id) AS r,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM lenned),
       |bounds AS (
       |  SELECT source,
       |    max(CASE WHEN r = CAST(ceil(n * 0.25) AS BIGINT) THEN n_len END) AS q1,
       |    max(CASE WHEN r = CAST(ceil(n * 0.50) AS BIGINT) THEN n_len END) AS q2,
       |    max(CASE WHEN r = CAST(ceil(n * 0.75) AS BIGINT) THEN n_len END) AS q3
       |  FROM ranked GROUP BY source),
       |binned AS (
       |  SELECT l.doc_id, l.source,
       |    CAST((CASE WHEN l.n_len > b.q1 THEN 1 ELSE 0 END) +
       |         (CASE WHEN l.n_len > b.q2 THEN 1 ELSE 0 END) +
       |         (CASE WHEN l.n_len > b.q3 THEN 1 ELSE 0 END) AS VARCHAR) AS bin
       |  FROM lenned l JOIN bounds b USING (source)),
       |g AS (
       |  SELECT doc_id, source, bin,
       |    CASE bin WHEN '3' THEN 2 WHEN '2' THEN 1 ELSE 0 END AS fw,
       |    CASE bin WHEN '1' THEN '${hexThreshold(0.5)}'
       |             ELSE '${hexThreshold(0.0)}' END AS cut
       |  FROM binned WHERE bin IN ('1', '2', '3')),
       |e AS (SELECT doc_id, source, bin, fw, cut,
       |        unnest(range(0, fw + 1)) AS epoch FROM g)
       |SELECT doc_id, source, bin, epoch FROM e
       |WHERE epoch < fw OR md5(doc_id || ':' || epoch) < cut""".stripMargin
  }

  val entries: Seq[Entry] = Seq(
    Entry("pipeline_corpus_prep", corpusPrep, Some(corpusPrepSql)),
    Entry("pipeline_curriculum_mix", curriculumMix, Some(curriculumMixSql)))
}
