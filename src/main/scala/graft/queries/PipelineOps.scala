package graft.queries

import graft.Tables
import graft.ops.Dedup
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

  // ---- pipeline_pretrain_corpus — the crawl-to-training-corpus
  // CAPSTONE: every stage below is an individually oracle-checked gate
  // entry; this query is their composition as ONE plan under ONE hash —
  // the product a pretraining data team actually ships.
  //
  //   raw docs → seeded duplication (re-keyed ~J0.9 marker twins +
  //   licence headers — each dedup stage must have real prey, the
  //   non-vacuity stance every dedup gate takes)
  //   → WARC response intake (byte-exact record walk, status + mime
  //     gates, HTML strip, mojibake repair)      [pipeline_warc_intake]
  //   → Gopher quality battery                   [text_gopher_rules]
  //   → MinHash-LSH near-dup removal, keep-min-id [dedup_minhash_lsh]
  //   → keep-first exact-substring dedup  [dedup_substring_keepfirst]
  //   → token accounting + greedy sequence packing [text_pack_sequences]
  //
  // Stage ORDER is the scale design: intake and quality are scan-local
  // codegen'd work that shrinks the corpus before the first shuffle;
  // near-dup removal runs BEFORE substring dedup (substring stripping
  // mutates twin texts and would destroy the J≥0.5 signal minhash
  // hunts); packing's window runs over the smallest frame of all.
  private val pretrainHdr =
    "standard corpus licence header text repeated across every seventh document intake here"

  private[graft] val pretrainT = graft.ops.GopherRules.Thresholds(
    minWords = 15, maxWords = 105, minMeanWordLen = 2, maxMeanWordLen = 14,
    minStopwords = 0)

  // One parameter set shared by the gate query AND the streaming twin
  // (StreamingCorpusSpec): the twin's incremental-vs-artifact stages
  // only equal the batch run when every sketch parameter matches.
  private[graft] val pretrainShingleN = 3
  private[graft] val pretrainNumHashes = 32
  private[graft] val pretrainBands = 8
  private[graft] val pretrainThreshold = 0.5
  private[graft] val pretrainMinhashFamily: graft.ops.HashFamily =
    graft.ops.Md5Mix32Family
  private[graft] val pretrainK = 8
  private[graft] val pretrainSubstringFamily: graft.ops.HashFamily =
    graft.ops.Md5Family

  /** Intake + quality head of the capstone over an already-seeded
    * (doc_id, text) frame — factored so the streaming twin runs the
    * SAME code per micro-batch that the batch gate runs over the whole
    * corpus (both stages are row-local and therefore stream-safe).
    */
  private[graft] def pretrainQuality(
      seeded: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    WarcOps.intakeCleanDocs(seeded).filter(
      graft.ops.GopherRules.signals(col("clean"), pretrainT)("keep"))

  /** Substring-dedup output → the (doc_id, n_final, fp) manifest row
    * shape the packer consumes. Factored so the streaming twin can
    * accumulate manifest rows per micro-batch.
    */
  private[graft] def pretrainManifest(
      sub: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sub.select(col("id").as("doc_id"),
      (col("n_toks") - col("n_removed")).as("n_final"),
      md5(col("kept_text")).as("fp"))

  /** Manifest → the packed final frame. Packing is a PUBLISH-time step
    * over the bounded manifest, so the streaming twin applies it once
    * to the accumulated manifest rather than per micro-batch.
    */
  private[graft] def pretrainPack(
      manifest: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.ops.Packing.packSequences(manifest,
      "doc_id", "n_final", budget = 2000L, shards = 8)
      .select(col("doc_id"), col("shard"), col("pack"),
        col("n_final").as("n_toks"), col("fp"))

  /** The capstone's stage composition from an already-seeded frame to
    * the packed manifest — the batch side of the streaming twin.
    */
  private[graft] def pretrainFromSeeded(
      seeded: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // THREE consumers read the quality-survivor frame (minhash
    // shingling, the keep anti-join, substring dedup's two passes) —
    // unpersisted, the whole WARC-intake + Gopher lineage re-evaluates
    // per consumer: measured 170.8 s at sf10 where the summed stage
    // components are ~77 s (3–4 redundant full-corpus scans; at 100 TB
    // that is the difference between one intake pass and four). Same
    // MEMORY_AND_DISK posture as minhashLshPairs' shingle cache;
    // released by the context cleaner on plan GC.
    val q = pretrainQuality(seeded)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.minhashLshPairs(q, "doc_id", "clean",
      n = pretrainShingleN, numHashes = pretrainNumHashes,
      bands = pretrainBands, threshold = pretrainThreshold,
      family = pretrainMinhashFamily)
    // `kept` has three consumers of its own inside substringDedup (the
    // positioned-gram pass, that pass's first-occurrence self-join, and
    // the rewrite's docs side) — unpersisted, each re-runs the ENTIRE
    // minhash-LSH stage (signatures, banding, bucket pairing, Jaccard
    // verify: the capstone's most expensive component) plus the
    // anti-join. Measured at sf0.1: full capstone ~15–17 s vs ~7.5 s
    // summed stages; persisting kept closes exactly that gap. Same
    // MEMORY_AND_DISK spill posture as q above — at 100 TB both frames
    // are disk-backed columnar blocks, still strictly cheaper than 2–3
    // extra full minhash re-evaluations.
    val kept = q.join(pairs.select(col("id_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sub = Dedup.substringDedup(kept, "doc_id", "clean",
      k = pretrainK, family = pretrainSubstringFamily)
    pretrainPack(pretrainManifest(sub))
  }

  private val pretrainCorpus: Q = (s, dir) => {
    val base = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
    val seeded = DedupOps.seedMarkerDups(base)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(pretrainHdr + " "), col("text")))
          .otherwise(col("text")))
    pretrainFromSeeded(seeded)
  }

  // The oracle is the stage-by-stage composition of the individual
  // gates' proven CTEs, parameterized by the upstream CTE name. The
  // intake stage replays as `text || suffix` (the pipeline_warc_intake
  // oracle's device: expected output derives from doc attributes alone,
  // so a single miscounted byte anywhere in the record walk breaks the
  // hash of every downstream stage).
  //
  // `del AS MATERIALIZED` is load-bearing: inlined, DuckDB plans the
  // whole minhash subtree inside the NOT-IN mark join and holds its
  // intermediates concurrently with the substring stage — measured
  // > 40 GiB unspillable peak at sf1 (the composed query OOMs where
  // its two halves run fine split). Materialized, the same data point
  // completes in 37 s under the precheck's default 14 GiB limit.
  private val pretrainCorpusSql = {
    val suffixCases = WarcOps.intakePhrases.zipWithIndex
      .map { case (p, i) => s"WHEN $i THEN ' ${p.replace("'", "''")}'" }
      .mkString(" ")
    s"""WITH raw0 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 10000000, text || ' graft dup marker' FROM documents
       |  WHERE doc_id % 5 = 0),
       |hdr AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN '$pretrainHdr ' || text
       |         ELSE text END AS text
       |  FROM raw0),
       |clean AS (
       |  SELECT doc_id,
       |    text || (CASE doc_id % 4 $suffixCases ELSE ' plain' END) AS t
       |  FROM hdr),
       |q AS (
       |  SELECT doc_id, t FROM (
       |    SELECT doc_id, t,
       |      list_filter(string_split_regex(trim(t), '\\s+'), x -> x <> '') AS ws,
       |      CAST(coalesce(len(t) - len(replace(t, '#', '')), 0) AS BIGINT)
       |        + CAST(coalesce((len(t) - len(replace(t, '...', ''))) / 3, 0) AS BIGINT)
       |        AS symbol_hits
       |    FROM clean) c
       |  WHERE len(ws) BETWEEN ${pretrainT.minWords} AND ${pretrainT.maxWords}
       |    AND len(ws) > 0
       |    AND list_aggregate(list_transform(ws, w -> len(w)), 'sum')
       |          >= ${pretrainT.minMeanWordLen} * len(ws)
       |    AND list_aggregate(list_transform(ws, w -> len(w)), 'sum')
       |          <= ${pretrainT.maxMeanWordLen} * len(ws)
       |    AND symbol_hits * ${pretrainT.maxSymbolWordRatio._2}
       |          <= len(ws) * ${pretrainT.maxSymbolWordRatio._1}
       |    AND len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
       |          * ${pretrainT.minAlphaWordFrac._2}
       |          >= len(ws) * ${pretrainT.minAlphaWordFrac._1}),
       |mdocs AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(trim(t), '\\s+'), x -> x <> '') AS toks
       |  FROM q WHERE trim(t) <> ''),
       |shl AS (
       |  SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
       |    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
       |  FROM mdocs WHERE len(toks) >= 3),
       |ex AS (SELECT doc_id, unnest(sh) AS g FROM shl),
       |counts AS (SELECT doc_id, len(sh) AS n_sh FROM shl),
       |${DedupOps.mixConstsCte(32)},
       |minh AS (
       |  SELECT doc_id, seed, min(${DedupOps.mixHash}) AS v
       |  FROM ex CROSS JOIN consts
       |  GROUP BY doc_id, seed),
       |sig AS (SELECT doc_id, list(v ORDER BY seed) AS sig FROM minh GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, b,
       |    ('0x' || substr(md5(b || ':' ||
       |       array_to_string(sig[b*4+1 : b*4+4], ',')), 1, 15))::BIGINT AS bh
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS b) bs),
       |ok_buckets AS (
       |  SELECT b, bh FROM banded GROUP BY b, bh
       |  HAVING count(*) BETWEEN 2 AND 1024),
       |mcand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM banded x
       |  JOIN banded y ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id
       |  JOIN ok_buckets o ON x.b = o.b AND x.bh = o.bh),
       |mcommon AS (
       |  SELECT c.id_a, c.id_b, count(*) AS n_common
       |  FROM mcand c
       |  JOIN ex x ON x.doc_id = c.id_a
       |  JOIN ex y ON y.doc_id = c.id_b AND y.g = x.g
       |  GROUP BY 1, 2),
       |del AS MATERIALIZED (
       |  SELECT DISTINCT id_b FROM mcommon
       |  JOIN counts a ON id_a = a.doc_id
       |  JOIN counts b ON id_b = b.doc_id
       |  WHERE CAST(n_common AS DOUBLE) / (a.n_sh + b.n_sh - n_common) >= 0.5),
       |kept2 AS (
       |  SELECT doc_id, t FROM q WHERE doc_id NOT IN (SELECT id_b FROM del)),
       |sdocs AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(t), '\\s+'), x -> x <> '') AS tk
       |  FROM kept2),
       |socc AS (
       |  SELECT doc_id, CAST(r.i AS INT) AS p,
       |    ('0x' || substr(md5('0:' || array_to_string(tk[r.i+1 : r.i+8], ' ')), 1, 15))::BIGINT AS gh
       |  FROM sdocs, unnest(range(0, greatest(len(tk) - 7, 0))) AS r(i)),
       |smk AS (
       |  SELECT doc_id, p FROM (
       |    SELECT doc_id, p,
       |      row_number() OVER (PARTITION BY gh ORDER BY doc_id, p) AS rn
       |    FROM socc) WHERE rn > 1),
       |scov AS (
       |  SELECT DISTINCT doc_id, p + r.j AS cq
       |  FROM smk, unnest(range(0, 8)) AS r(j)),
       |sts AS (
       |  SELECT doc_id, tq.cq AS cq, tk[CAST(tq.cq AS INT) + 1] AS tok
       |  FROM sdocs, unnest(range(0, len(tk))) AS tq(cq)),
       |skt AS (
       |  SELECT sts.doc_id, sts.cq, sts.tok
       |  FROM sts LEFT JOIN scov c ON c.doc_id = sts.doc_id AND c.cq = sts.cq
       |  WHERE c.doc_id IS NULL),
       |sj AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY cq) AS kept
       |  FROM skt GROUP BY doc_id),
       |manifest AS (
       |  SELECT d.doc_id,
       |    CAST(coalesce(sj.n_kept, 0) AS BIGINT) AS n_final,
       |    md5(coalesce(sj.kept, '')) AS fp
       |  FROM sdocs d LEFT JOIN sj USING (doc_id))
       |SELECT doc_id, doc_id % 8 AS shard,
       |  CAST(floor(coalesce(
       |    sum(n_final) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |    0) / 2000) AS BIGINT) AS pack,
       |  n_final AS n_toks, fp
       |FROM manifest""".stripMargin
  }

  val entries: Seq[Entry] = Seq(
    Entry("pipeline_corpus_prep", corpusPrep, Some(corpusPrepSql)),
    Entry("pipeline_curriculum_mix", curriculumMix, Some(curriculumMixSql)),
    Entry("pipeline_pretrain_corpus", pretrainCorpus, Some(pretrainCorpusSql)))
}
