package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions.{lower_root => lowerRoot}

/** Text-analysis operators for the training-data pipeline surface
  * (builder brief): token counting, quality scoring, language-ID
  * heuristics, document fingerprinting. Everything is a row-local
  * codegen'd expression — embarrassingly parallel, no shuffle, scales
  * linearly with input splits at 100 TB.
  */
object TextOps {
  import Catalog.{Entry, Q}

  // Empty tokens FILTERED — see Dedup.tokens: the naive split keeps
  // leading/trailing empties for non-space whitespace.
  private def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  // Whitespace token count + BPE-ish regex token count
  // (letter-runs / digit-runs / single non-space symbols).
  private val tokCount: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])"), lit(1))).as("n_re_tokens"))
  private val tokCountSql =
    """SELECT doc_id,
      |  CASE WHEN trim(text) = '' THEN 0
      |       ELSE len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) END AS n_ws_tokens,
      |  len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1)) AS n_re_tokens
      |FROM documents""".stripMargin

  // Quality scoring: char length, token count, mean token length,
  // stopword ratio, uppercase ratio — the usual pretraining-filter
  // features, rounded for oracle stability.
  private val quality: Q = (s, dir) => {
    val toks = tokens(col("text"))
    val stop = filter(toks, t => t.isin("the", "a", "of", "and"))
    val nTok = size(toks)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).as("n_chars_actual"),
        nTok.as("n_tokens"),
        round(when(nTok > 0, length(concat_ws("", toks)).cast("double") / nTok)
          .otherwise(lit(0.0)), 4).as("mean_tok_len"),
        round(when(nTok > 0, size(stop).cast("double") / nTok)
          .otherwise(lit(0.0)), 4).as("stopword_ratio"))
  }
  private val qualitySql =
    """SELECT doc_id, length(text) AS n_chars_actual,
      |  CASE WHEN trim(text) = '' THEN 0
      |       ELSE len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) END AS n_tokens,
      |  round(CASE WHEN trim(text) = '' THEN 0.0
      |    ELSE CAST(len(regexp_replace(trim(text), '\s', '', 'g')) AS DOUBLE)
      |         / len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) END, 4) AS mean_tok_len,
      |  round(CASE WHEN trim(text) = '' THEN 0.0
      |    ELSE CAST(len(list_filter(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''),
      |           t -> t IN ('the','a','of','and'))) AS DOUBLE)
      |         / len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) END, 4) AS stopword_ratio
      |FROM documents""".stripMargin

  // Language-ID heuristic: stopword-marker counts per candidate
  // language, argmax with deterministic tie-break. (On real corpora the
  // marker sets are char n-grams; the mechanism is identical.)
  private val langid: Q = (s, dir) => {
    val toks = tokens(col("text"))
    def score(markers: String*): Column =
      size(filter(toks, t => t.isin(markers: _*)))
    val sEn = score("the", "a", "of", "and")
    val sDe = score("der", "und", "die", "das")
    val sFr = score("le", "la", "et", "les")
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), sEn.as("s_en"), sDe.as("s_de"), sFr.as("s_fr"),
        when(sEn >= sDe && sEn >= sFr && sEn > 0, "en")
          .when(sDe >= sFr && sDe > 0, "de")
          .when(sFr > 0, "fr")
          .otherwise("und").as("lang_guess"))
  }
  private val langidSql =
    """SELECT doc_id, s_en, s_de, s_fr,
      |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
      |       WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
      |       WHEN s_fr > 0 THEN 'fr'
      |       ELSE 'und' END AS lang_guess
      |FROM (
      |  SELECT doc_id,
      |    len(list_filter(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''),
      |        t -> t IN ('the','a','of','and'))) AS s_en,
      |    len(list_filter(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''),
      |        t -> t IN ('der','und','die','das'))) AS s_de,
      |    len(list_filter(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''),
      |        t -> t IN ('le','la','et','les'))) AS s_fr
      |  FROM documents WHERE TRUE) t""".stripMargin

  // Document fingerprint: digest of the normalized text (md5 agrees
  // byte-for-byte between Spark and DuckDB).
  private val fingerprint: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        md5(regexp_replace(lowerRoot(trim(col("text"))), "\\s+", " ")).as("fp"))
  private val fingerprintSql =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |FROM documents""".stripMargin

  // Edit distance between source tags and a reference label — the
  // classic DP levenshtein agrees exactly across engines.
  private val editDist: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        levenshtein(col("source"), lit("src10")).as("dist_src10"),
        levenshtein(col("lang"), lit("en")).as("dist_en"))
  private val editDistSql =
    """SELECT doc_id, levenshtein(source, 'src10') AS dist_src10,
      |  levenshtein(lang, 'en') AS dist_en
      |FROM documents""".stripMargin

  // Deterministic md5-keyed 20% sample — the reproducible train/test
  // split op (stable across runs, engines, and partitionings; a plain
  // codegen'd filter, no shuffle). md5 agrees byte-for-byte with the
  // DuckDB oracle.
  private val hashSample: Q = (s, dir) =>
    graft.ops.Sampling.hashSample(
      Tables.load(s, dir, "documents"), "doc_id", fraction = 0.2)
      .select(col("doc_id"), col("source"), col("lang"))
  private val hashSampleSql =
    s"""SELECT doc_id, source, lang FROM documents
       |WHERE md5(CAST(doc_id AS VARCHAR)) < '${graft.ops.Sampling.hexThreshold(0.2)}'""".stripMargin

  // Corpus rebalancing: per-language keep fractions (downsample the
  // dominant language, keep the tail) via the same engine-portable
  // md5 predicate — still a shuffle-free codegen'd filter.
  private val stratified: Q = (s, dir) =>
    graft.ops.Sampling.stratifiedSample(
      Tables.load(s, dir, "documents"), "doc_id", "lang",
      fractions = Map("en" -> 0.25, "de" -> 1.0, "fr" -> 1.0, "es" -> 0.5),
      defaultFraction = 0.1)
      .select(col("doc_id"), col("lang"))
  private val stratifiedSql = {
    import graft.ops.Sampling.hexThreshold
    s"""SELECT doc_id, lang FROM documents
       |WHERE md5(CAST(doc_id AS VARCHAR)) <
       |  CASE lang WHEN 'en' THEN '${hexThreshold(0.25)}'
       |            WHEN 'de' THEN 'g'
       |            WHEN 'fr' THEN 'g'
       |            WHEN 'es' THEN '${hexThreshold(0.5)}'
       |            ELSE '${hexThreshold(0.1)}' END""".stripMargin
  }

  // Weighted corpus mixing: upsample src0 2.5× (epochs 0,1 + half of
  // epoch 2), keep src2 whole, downsample src1 to 0.4 and everything
  // else to 0.2 — deterministic, shuffle-free epoch fan-out.
  private val mix: Q = (s, dir) =>
    graft.ops.Mixture.mixCorpora(
      Tables.load(s, dir, "documents"), "doc_id", "source",
      weights = Map("src0" -> 2.5, "src1" -> 0.4, "src2" -> 1.0),
      defaultWeight = 0.2)
      .select(col("doc_id"), col("source"), col("epoch"))
  private val mixSql = {
    import graft.ops.Sampling.hexThreshold
    s"""WITH g AS (
       |  SELECT doc_id, source,
       |    CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
       |                WHEN 'src2' THEN 1 ELSE 0 END AS fw,
       |    CASE source WHEN 'src0' THEN '${hexThreshold(0.5)}'
       |                WHEN 'src1' THEN '${hexThreshold(0.4)}'
       |                WHEN 'src2' THEN '${hexThreshold(0.0)}'
       |                ELSE '${hexThreshold(0.2)}' END AS cut
       |  FROM documents),
       |e AS (SELECT doc_id, source, fw, cut,
       |        unnest(range(0, fw + 1)) AS epoch FROM g)
       |SELECT doc_id, source, epoch FROM e
       |WHERE epoch < fw OR md5(doc_id || ':' || epoch) < cut""".stripMargin
  }

  // Deterministic weighted sampling (ops.Sampling.weightedTopK):
  // length-biased top-100 draw — Efraimidis–Spirakis keys off md5, so
  // the oracle reproduces the exact same winners.
  private val weighted: Q = (s, dir) =>
    graft.ops.Sampling.weightedTopK(
      Tables.load(s, dir, "documents").select("doc_id", "n_chars"),
      keyCol = "doc_id", weightCol = "n_chars", k = 100)
  private val weightedSql =
    """SELECT doc_id, n_chars FROM (
      |  SELECT doc_id, n_chars,
      |    -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
      |        / 4294967296.0) / n_chars AS r
      |  FROM documents WHERE n_chars > 0) t
      |ORDER BY r, doc_id LIMIT 100""".stripMargin

  // Sequence packing (ops.Packing): concat-then-chunk token-budget
  // layout over 8 deterministic shards, n_chars as the token proxy.
  private val pack: Q = (s, dir) =>
    graft.ops.Packing.packSequences(
      Tables.load(s, dir, "documents").select("doc_id", "n_chars"),
      idCol = "doc_id", tokenCol = "n_chars", budget = 2000L, shards = 8)
      .select(col("doc_id"), col("shard"), col("pack"))
  private val packSql =
    """SELECT doc_id, doc_id % 8 AS shard,
      |  CAST(floor(coalesce(
      |    sum(n_chars) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    0) / 2000) AS BIGINT) AS pack
      |FROM documents""".stripMargin

  // Fuzzy self-join of source labels within edit distance 1
  // (ops.FuzzyJoin, SymSpell deletion-neighborhood — rows×len work,
  // never rows²). The quadratic levenshtein join is the oracle.
  private val fuzzy: Q = (s, dir) => {
    val src = Tables.load(s, dir, "documents").select(col("source"))
    graft.ops.FuzzyJoin.withinEditDistance1(src, "source", src, "source")
  }
  private val fuzzySql =
    """SELECT a.source AS source_l, b.source AS source_r,
      |  CAST(levenshtein(a.source, b.source) AS INTEGER) AS distance
      |FROM (SELECT DISTINCT source FROM documents) a,
      |     (SELECT DISTINCT source FROM documents) b
      |WHERE levenshtein(a.source, b.source) <= 1""".stripMargin

  // Unicode NFC canonicalization before fingerprinting — composed vs
  // decomposed accents otherwise make byte-identical text hash apart.
  // Native codegen'd expression; DuckDB nfc_normalize is the oracle twin.
  private val normalize: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        md5(graft.functions.GraftExtensions.nfc_normalize(lowerRoot(trim(col("text")))))
          .as("canonical_fp"))
  private val normalizeSql =
    """SELECT doc_id, md5(nfc_normalize(lower(trim(text)))) AS canonical_fp
      |FROM documents""".stripMargin

  // BM25 relevance of every document against a fixed query-term set
  // (ops.TextRank) — retrieval-based data selection / quality
  // bucketing. The oracle mirrors the exact expression tree (same
  // literals, same association) so doubles match bit-for-bit before
  // the shared round(4).
  private val bm25: Q = (s, dir) =>
    graft.ops.TextRank.bm25(Tables.load(s, dir, "documents"),
        idCol = "doc_id", textCol = "text",
        queryTerms = Seq("spark", "join", "stream"))
      .select(col("doc_id"), round(col("bm25"), 4).as("bm25"))
  private val bm25Sql =
    """WITH toks AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
      |    FROM documents) u WHERE t <> ''
      |), dtf AS (
      |  SELECT doc_id, count(*) AS dl,
      |    count(CASE WHEN t = 'spark' THEN 1 END) AS tf_spark,
      |    count(CASE WHEN t = 'join' THEN 1 END) AS tf_join,
      |    count(CASE WHEN t = 'stream' THEN 1 END) AS tf_stream
      |  FROM toks GROUP BY doc_id
      |), st AS (
      |  SELECT count(*) AS n, avg(dl) AS avgdl,
      |    count(CASE WHEN tf_spark > 0 THEN 1 END) AS df_spark,
      |    count(CASE WHEN tf_join > 0 THEN 1 END) AS df_join,
      |    count(CASE WHEN tf_stream > 0 THEN 1 END) AS df_stream
      |  FROM dtf
      |)
      |SELECT doc_id, round(
      |    CASE WHEN tf_spark > 0
      |         THEN ln((n - df_spark + 0.5) / (df_spark + 0.5) + 1)
      |              * (tf_spark * 2.2) / (tf_spark + (1.2 * (0.25 + 0.75 * dl / avgdl)))
      |         ELSE 0.0 END
      |  + CASE WHEN tf_join > 0
      |         THEN ln((n - df_join + 0.5) / (df_join + 0.5) + 1)
      |              * (tf_join * 2.2) / (tf_join + (1.2 * (0.25 + 0.75 * dl / avgdl)))
      |         ELSE 0.0 END
      |  + CASE WHEN tf_stream > 0
      |         THEN ln((n - df_stream + 0.5) / (df_stream + 0.5) + 1)
      |              * (tf_stream * 2.2) / (tf_stream + (1.2 * (0.25 + 0.75 * dl / avgdl)))
      |         ELSE 0.0 END, 4) AS bm25
      |FROM dtf, st
      |WHERE tf_spark > 0 OR tf_join > 0 OR tf_stream > 0""".stripMargin

  // Unigram-LM quality score (ops.TextRank.unigramLogProb): mean
  // per-token log probability under the corpus unigram distribution.
  private val lmScore: Q = (s, dir) =>
    graft.ops.TextRank.unigramLogProb(Tables.load(s, dir, "documents"),
        idCol = "doc_id", textCol = "text")
      .select(col("doc_id"), round(col("mean_logprob"), 4).as("mean_logprob"))
  private val lmScoreSql =
    """WITH toks AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
      |    FROM documents) u WHERE t <> ''
      |), vocab AS (
      |  SELECT t, count(*) AS cnt FROM toks GROUP BY t
      |), tot AS (SELECT count(*) AS total FROM toks)
      |SELECT doc_id,
      |  round(sum(ln(cnt / total)) / count(*), 4) AS mean_logprob
      |FROM toks JOIN vocab USING (t), tot
      |GROUP BY doc_id""".stripMargin

  // Bigram-LM quality score (ops.TextRank.bigramLogProb): add-one
  // smoothed mean transition log-probability — one Markov order above
  // text_lm_score, the CCNet perplexity-filter shape. Same ln-of-
  // integer-counts algebra → same expression tree both engines.
  private val bigramLm: Q = (s, dir) =>
    graft.ops.TextRank.bigramLogProb(Tables.load(s, dir, "documents"),
        idCol = "doc_id", textCol = "text")
      .select(col("doc_id"), round(col("mean_logprob"), 4).as("mean_logprob"),
        col("n_bigrams"))
  private val bigramLmSql =
    """WITH d AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                t -> t <> '') AS ts
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
      |    i -> struct_pack(w1 := ts[i], w2 := ts[i+1]))) AS p
      |  FROM d),
      |bigrams AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
      |docbi AS (
      |  SELECT doc_id, w1, w2, count(*) AS n FROM bigrams GROUP BY doc_id, w1, w2),
      |uni AS (
      |  SELECT t AS w1, count(*) AS c1 FROM (SELECT unnest(ts) AS t FROM d) u
      |  GROUP BY t),
      |v AS (SELECT count(*) AS vs FROM uni),
      |bi AS (SELECT w1, w2, CAST(sum(n) AS BIGINT) AS c2 FROM docbi GROUP BY w1, w2)
      |SELECT doc_id,
      |  round(sum(n * ln(CAST(c2 + 1 AS DOUBLE) / (c1 + vs))) / sum(n), 4)
      |    AS mean_logprob,
      |  CAST(sum(n) AS BIGINT) AS n_bigrams
      |FROM docbi JOIN bi USING (w1, w2) JOIN uni USING (w1), v
      |GROUP BY doc_id""".stripMargin

  // Overlapping chunking (ops.TextRank.chunk): 500-char chunks with
  // 100-char overlap; chunks ship as md5 fingerprints so the oracle
  // hash stays small.
  private val chunks: Q = (s, dir) =>
    graft.ops.TextRank.chunk(Tables.load(s, dir, "documents"),
        idCol = "doc_id", textCol = "text", size = 500, overlap = 100)
      .select(col("doc_id"), col("chunk_idx"), md5(col("chunk")).as("chunk_md5"))
  private val chunksSql =
    """SELECT doc_id, CAST(s / 400 AS BIGINT) AS chunk_idx,
      |  md5(substring(text, s + 1, 500)) AS chunk_md5
      |FROM (SELECT doc_id, text,
      |        unnest(generate_series(0, greatest(length(text) - 101, 0), 400)) AS s
      |      FROM documents WHERE length(text) > 0) t""".stripMargin

  // Gopher-style repetition quality signals (ops.TextRank): top-2-gram
  // character coverage + duplicate-token fraction per document. The
  // winner tie-break is a row_number ordering reproduced verbatim in
  // the oracle.
  private val repetition: Q = (s, dir) =>
    graft.ops.TextRank.repetitionSignals(Tables.load(s, dir, "documents"),
        idCol = "doc_id", textCol = "text")
      .select(col("doc_id"),
        round(col("top_bigram_frac"), 4).as("top_bigram_frac"),
        round(col("dup_token_frac"), 4).as("dup_token_frac"))
  private val repetitionSql =
    """WITH base AS (
      |  SELECT doc_id, length(text) AS chars,
      |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents
      |), bc AS (
      |  SELECT doc_id, chars, bigram, count(*) AS cnt FROM (
      |    SELECT doc_id, chars,
      |      unnest(list_transform(range(1, len(toks)),
      |                            i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      |    FROM base) b
      |  GROUP BY 1, 2, 3
      |), win AS (
      |  SELECT doc_id,
      |    CAST(cnt * length(bigram) AS DOUBLE) / chars AS top_bigram_frac,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY cnt DESC, bigram DESC) AS rn
      |  FROM bc
      |), dup AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) / sum(cnt)
      |      AS dup_token_frac
      |  FROM (SELECT doc_id, tok, count(*) AS cnt FROM (
      |          SELECT doc_id, unnest(toks) AS tok FROM base) t
      |        GROUP BY 1, 2) tc
      |  GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |  round(coalesce(w.top_bigram_frac, 0), 4) AS top_bigram_frac,
      |  round(d.dup_token_frac, 4) AS dup_token_frac
      |FROM dup d LEFT JOIN (SELECT * FROM win WHERE rn = 1) w
      |  ON w.doc_id = d.doc_id""".stripMargin

  // Capped inverted index: term → document frequency + the first 20
  // postings. Per-doc `array_distinct` dedupes BEFORE the explode so
  // each (term, doc) pair rides the shuffle once; df is a map-side-
  // combined count; postings come from the bounded ops.TopK aggregator
  // (k rows per term per map task — a stopword appearing in every
  // document costs 20 buffer slots, not an unbounded collect_list).
  // Both aggregates hash-partition on term, so the final join reuses
  // the exchange. Output is (term, df, rank, doc_id) rows — no
  // list-typed columns, which keeps the oracle compare engine-neutral.
  private val inverted: Q = (s, dir) => {
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(
        filter(split(lowerRoot(col("text")), "[^a-z0-9]+"), t => t =!= ""))).as("term"))
    val dfAgg = toks.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val top = graft.ops.TopK.topKPerGroup(
      toks.withColumn("__ord", -col("doc_id").cast("double")),
      groupCol = "term", orderCol = "__ord", tieCol = "doc_id", k = 20)
    top.join(dfAgg, "term").filter(col("df") >= 10)
      .select(col("term"), col("df"), col("rank"), col("doc_id"))
  }
  private val invertedSql =
    """WITH td AS (
      |  SELECT DISTINCT doc_id, t AS term FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
      |    FROM documents) u WHERE t <> ''
      |), d AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM td GROUP BY term
      |), r AS (
      |  SELECT term, doc_id,
      |    CAST(row_number() OVER (PARTITION BY term ORDER BY doc_id) AS BIGINT)
      |      AS "rank"
      |  FROM td
      |)
      |SELECT r.term, d.df, r."rank", r.doc_id
      |FROM r JOIN d USING (term)
      |WHERE d.df >= 10 AND r."rank" <= 20""".stripMargin

  // text_pii_redact — ops.Redact over the corpus. The synthetic corpus
  // contains no PII, so the query INJECTS deterministic emails / IPs /
  // phones (keyed off doc_id, identically in Spark and the oracle SQL)
  // and then redacts: every rule is exercised on every row and the
  // redacted text + per-rule audit counts hash-match the oracle.
  private val piiRedact: Q = (s, dir) => {
    val injected = concat(
      col("text"),
      when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit(" mail user"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(" from 10.1."), pmod(col("doc_id"), lit(200)), lit(".7"))).otherwise(lit("")),
      concat(lit(" call 555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
    Tables.load(s, dir, "documents")
      .withColumn("__inj", injected)
      .select((col("doc_id") +: graft.ops.Redact.redact(col("__inj")).as("red") +:
        graft.ops.Redact.counts(col("__inj"))): _*)
  }

  private val piiRedactSql = {
    val inj = """text
      | || CASE WHEN doc_id % 2 = 0 THEN ' mail user' || doc_id || '@example.com' ELSE '' END
      | || CASE WHEN doc_id % 3 = 0 THEN ' from 10.1.' || (doc_id % 200) || '.7' ELSE '' END
      | || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"""
      .stripMargin.replace("\n", "")
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phone = "\\b[0-9]{3}-([0-9]{3}-)?[0-9]{4}\\b"
    s"""WITH inj AS (SELECT doc_id, $inj AS t FROM documents)
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(t,
       |    '$email', '<EMAIL>', 'g'),
       |    '$ipv4', '<IP>', 'g'),
       |    '$phone', '<PHONE>', 'g') AS red,
       |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(t, '$ipv4')) AS BIGINT) AS n_ipv4,
       |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phone
       |FROM inj""".stripMargin
  }

  // text_vocab — ops.Vocab corpus vocabulary (count → minCount filter →
  // deterministic top-V → rank ids). The corpus-sized stage is one
  // map-side-combined hash aggregate; the cut is TakeOrdered (bounded
  // heap per partition), id assignment windows over V rows only.
  private val vocab: Q = (s, dir) =>
    graft.ops.Vocab.build(
      Tables.load(s, dir, "documents"), "text", vocabSize = 200)

  private val vocabSql =
    """WITH tok AS (
      |  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
      |  FROM documents),
      |cnt AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS cnt
      |  FROM tok WHERE token <> '' GROUP BY token)
      |SELECT token, cnt,
      |  CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS token_id
      |FROM cnt ORDER BY token_id LIMIT 200""".stripMargin

  // text_oov — per-document out-of-vocabulary audit against that vocab
  // (broadcast join on the V-row vocab; the corpus never shuffles).
  private val oov: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    graft.ops.Vocab.oovStats(docs, "doc_id", "text",
      graft.ops.Vocab.build(docs, "text", vocabSize = 10))
  }

  private val oovSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
      |  FROM documents),
      |vocab AS (
      |  SELECT token FROM (
      |    SELECT token, count(*) AS cnt FROM tok WHERE token <> '' GROUP BY token)
      |  ORDER BY cnt DESC, token LIMIT 10),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN token IN (SELECT token FROM vocab) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_in_vocab,
      |    round(CAST(count(*) - sum(CASE WHEN token IN (SELECT token FROM vocab)
      |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS oov_rate
      |  FROM tok WHERE token <> ''
      |  GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
      |  coalesce(a.n_in_vocab, 0) AS n_in_vocab, a.oov_rate
      |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  // text_encode — ops.Vocab.encode: documents → vocab-id sequences
  // (the tokenize step feeding text_pack_sequences). The id sequence is
  // hashed (md5 of the comma-joined ids) so the oracle compares exact
  // order-sensitive content without engine-specific array rendering.
  private val encode: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    graft.ops.Vocab.encode(docs, "doc_id", "text",
      graft.ops.Vocab.build(docs, "text", vocabSize = 10))
      .select(col("doc_id"),
        md5(concat_ws(",", transform(col("token_ids"),
          i => i.cast("string")))).as("ids_md5"),
        col("n_tokens"), col("n_unk"))
  }

  private val encodeSql =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token,
      |    unnest(generate_series(1, len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')))) AS pos
      |  FROM documents),
      |vocab AS (
      |  SELECT token, CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
      |    AS token_id
      |  FROM (SELECT token, count(*) AS cnt FROM tok WHERE token <> '' GROUP BY token)
      |  ORDER BY token_id LIMIT 10),
      |agg AS (
      |  SELECT t.doc_id,
      |    md5(array_to_string(list(COALESCE(v.token_id, 0) ORDER BY t.pos), ',')) AS ids_md5,
      |    CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
      |  FROM tok t LEFT JOIN vocab v ON t.token = v.token
      |  WHERE t.token <> ''
      |  GROUP BY t.doc_id)
      |SELECT d.doc_id, coalesce(a.ids_md5, md5('')) AS ids_md5,
      |  coalesce(a.n_tokens, 0) AS n_tokens, coalesce(a.n_unk, 0) AS n_unk
      |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  // Deterministic corpus shuffle: a reproducible global permutation
  // (training-order randomization) — md5 of the key as the sort
  // order, positions assigned by ops.GlobalIndex, so no single-task
  // window and the same permutation on every run/engine.
  private val shuffleQ: Q = (s, dir) =>
    graft.ops.GlobalIndex.withGlobalIndex(
      Tables.load(s, dir, "documents").select(col("doc_id")),
      Seq(md5(col("doc_id").cast("string")), col("doc_id")), "pos")
  private val shuffleSql =
    """SELECT doc_id,
      |  row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos
      |FROM documents""".stripMargin

  // Per-source length-quartile binning (curriculum bucketing) via the
  // histogram-located exact boundaries — no per-source sort task. The
  // oracle derives the same ceil(n·p)-th discrete boundaries with a
  // window (DuckDB is single-node; the POINT of ops.Binning is that
  // the Spark side does not).
  private val qualityBins: Q = (s, dir) =>
    graft.ops.Binning.quantileBins(
      Tables.load(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
      "source", "n_chars", Seq("doc_id"), bins = 4)
      .select(col("doc_id"), col("source"), col("n_chars"), col("bin"))
  private val qualityBinsSql =
    """WITH ranked AS (
      |  SELECT source, n_chars, doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM documents),
      |bounds AS (
      |  SELECT source,
      |    max(CASE WHEN r = CAST(ceil(n * 0.25) AS BIGINT) THEN n_chars END) AS q1,
      |    max(CASE WHEN r = CAST(ceil(n * 0.50) AS BIGINT) THEN n_chars END) AS q2,
      |    max(CASE WHEN r = CAST(ceil(n * 0.75) AS BIGINT) THEN n_chars END) AS q3
      |  FROM ranked GROUP BY source)
      |SELECT d.doc_id, d.source, d.n_chars,
      |  CAST((CASE WHEN d.n_chars > b.q1 THEN 1 ELSE 0 END) +
      |       (CASE WHEN d.n_chars > b.q2 THEN 1 ELSE 0 END) +
      |       (CASE WHEN d.n_chars > b.q3 THEN 1 ELSE 0 END) AS BIGINT) AS bin
      |FROM documents d JOIN bounds b USING (source)""".stripMargin

  // DEFLATE compression ratio (ops.QualityModel.compressionRatio):
  // codec-based repetition signal. No oracle engine exposes a codec,
  // so this is the harness's second rows-only row (with text_bpe);
  // determinism and the signal's direction are spec-pinned.
  private val compressionRatio: Q = (s, dir) =>
    graft.ops.QualityModel.compressionRatio(
      Tables.load(s, dir, "documents"), "doc_id", "text")

  // BPE tokenizer training + encode (ops.Bpe): the word table is the
  // only corpus-sized pass; the merge loop runs on that bounded
  // artifact. Iterative training is not SQL-expressible → rows-only
  // check; semantics are pinned by BpeSpec's hand-computed merges.
  private val bpe: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val words = graft.ops.Bpe.wordTable(docs, "text", maxWords = 2000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val merges = graft.ops.Bpe.learnMerges(words, numMerges = 50)
    graft.ops.Bpe.encode(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_bpe"))
  }

  // BPE ENCODE with a FIXED literal merge table — the inference half of
  // the tokenizer, oracle-checked (training above stays rows-only: the
  // merge loop is genuinely iterative). Both engines get the same
  // 30-merge constant; DuckDB replays the greedy rank-ordered collapse
  // with a recursive CTE over a boundary-safe symbol string: every
  // symbol is wrapped in \x1f separators, so the pair pattern
  // \x1f a \x1f\x1f b \x1f can only match whole adjacent symbols, and
  // one leftmost-nonoverlapping replace() == one Bpe.mergePair pass.
  // Output is (n_bpe, md5 of the space-joined token stream) — the
  // fingerprint pins token identity and order, not just counts.
  private val bpeEncodeMerges: Seq[(String, String)] = Seq(
    ("e", "r</w>"), ("o", "w</w>"), ("o", "r"), ("l", "u"), ("i", "n"),
    ("a", "r"), ("p", "ar"), ("e", "r"), ("a", "s"), ("t", "o"),
    ("a", "t"), ("a", "n</w>"), ("c", "an</w>"), ("s", "can</w>"),
    ("c", "o"), ("co", "lu"), ("colu", "m"), ("colum", "n</w>"),
    ("d", "ow</w>"), ("in", "dow</w>"), ("w", "indow</w>"),
    ("d", "er</w>"), ("or", "der</w>"), ("or", "t</w>"), ("s", "ort</w>"),
    ("par", "t</w>"), ("u", "p</w>"), ("a", "g"), ("ag", "g</w>"),
    ("a", "lu"))

  private val bpeEncode: Q = (s, dir) =>
    graft.ops.Bpe.encode(Tables.load(s, dir, "documents"),
        "doc_id", "text", bpeEncodeMerges)
      .select(col("doc_id"), col("n_bpe"),
        md5(concat_ws(" ", col("bpe_tokens"))).as("tok_fp"))

  private val bpeEncodeSql = {
    val values = bpeEncodeMerges.zipWithIndex
      .map { case ((a, b), i) => s"($i, '$a', '$b')" }.mkString(", ")
    s"""WITH RECURSIVE
      |m(rank, a, b) AS (VALUES $values),
      |mp AS (SELECT rank, chr(31)||a||chr(31)||chr(31)||b||chr(31) AS pat,
      |              chr(31)||a||b||chr(31) AS rep FROM m),
      |toks AS (
      |  SELECT doc_id, pos, w FROM (
      |    SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS w,
      |           unnest(range(1, len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))+1)) AS pos
      |    FROM documents WHERE text IS NOT NULL AND trim(text) <> '') u
      |  WHERE w <> ''),
      |words AS (SELECT DISTINCT w FROM toks),
      |enc(w, state, iter) AS (
      |  SELECT w,
      |    list_aggregate(list_transform(range(1, length(w)+1),
      |      i -> chr(31) || substr(w, CAST(i AS INTEGER), 1)
      |        || CASE WHEN i = length(w) THEN '</w>' ELSE '' END || chr(31)),
      |      'string_agg', '') AS state,
      |    0 AS iter
      |  FROM words
      |  UNION ALL
      |  SELECT w, replace(state, pat, rep) AS state, iter + 1
      |  FROM (
      |    SELECT e.w, e.state, e.iter, p.pat, p.rep,
      |      row_number() OVER (PARTITION BY e.w ORDER BY p.rank) AS rn
      |    FROM enc e JOIN mp p ON contains(e.state, p.pat)) t
      |  WHERE rn = 1),
      |final AS (
      |  SELECT w, state FROM (
      |    SELECT w, state, row_number() OVER (PARTITION BY w ORDER BY iter DESC) AS rn
      |    FROM enc) t WHERE rn = 1),
      |wtok AS (
      |  SELECT w,
      |    CAST((length(state) - length(replace(state, chr(31), ''))) / 2 AS BIGINT) AS nsym,
      |    trim(replace(state, chr(31)||chr(31), ' '), chr(31)) AS toks_str
      |  FROM final)
      |SELECT d.doc_id,
      |  coalesce(agg.n_bpe, 0) AS n_bpe,
      |  md5(coalesce(agg.toks, '')) AS tok_fp
      |FROM documents d LEFT JOIN (
      |  SELECT t.doc_id, CAST(sum(wt.nsym) AS BIGINT) AS n_bpe,
      |         string_agg(wt.toks_str, ' ' ORDER BY t.pos) AS toks
      |  FROM toks t JOIN wtok wt USING (w) GROUP BY t.doc_id) agg USING (doc_id)""".stripMargin
  }

  // Unigram-LM tokenizer training + encode (ops.UnigramLm): same
  // bounded-artifact architecture as text_bpe — the word table is the
  // only corpus pass, Viterbi-EM runs driver-side. Iterative EM is not
  // SQL-expressible → rows-only; semantics pinned by UnigramLmSpec and
  // a committed golden hash (GoldenFixtureSpec).
  private val unigram: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val words = graft.ops.Bpe.wordTable(docs, "text", maxWords = 2000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val model = graft.ops.UnigramLm.train(words, vocabSize = 60,
      maxPieceLen = 4, seedSize = 512)
    graft.ops.UnigramLm.encode(docs, "doc_id", "text", model)
      .select(col("doc_id"), col("n_uni"))
  }

  // Unigram ENCODE with a FIXED literal piece table — the inference
  // half, oracle-checked (training above stays rows-only). All pieces
  // share one score, so the Viterbi optimum is the minimum-piece
  // segmentation with the longest-last-piece tie rule; the corpus
  // vocabulary is CLOSED (31 words at every scale), so the oracle
  // carries each word's expected segmentation as a literal — derived
  // offline from the DP by hand-checkable minimal splits, never by
  // re-running the operator. The fingerprint pins token identity and
  // order, not just counts.
  private val unigramPieces: Seq[String] = Seq(
    "▁a", "gg", "bat", "ch", "big", "col", "umn", "cust", "omer", "dat",
    "dup", "fast", "fil", "ter", "gro", "up", "hash", "join", "key",
    "line", "mer", "ge", "ord", "er", "part", "que", "ry", "row", "scan",
    "slow", "sma", "ll", "sort", "spa", "rk", "stre", "am", "tab", "le",
    "the", "val", "ue", "vec", "tor", "win", "dow")
  private val unigramSegments: Seq[(String, String)] = Seq(
    "a" -> "▁a", "agg" -> "▁a gg", "batch" -> "▁ bat ch", "big" -> "▁ big",
    "column" -> "▁ col umn", "customer" -> "▁ cust omer",
    "data" -> "▁ dat a", "dup" -> "▁ dup", "fast" -> "▁ fast",
    "filter" -> "▁ fil ter", "group" -> "▁ gro up", "hash" -> "▁ hash",
    "join" -> "▁ join", "key" -> "▁ key", "line" -> "▁ line",
    "merge" -> "▁ mer ge", "order" -> "▁ ord er", "part" -> "▁ part",
    "query" -> "▁ que ry", "row" -> "▁ row", "scan" -> "▁ scan",
    "slow" -> "▁ slow", "small" -> "▁ sma ll", "sort" -> "▁ sort",
    "spark" -> "▁ spa rk", "stream" -> "▁ stre am", "table" -> "▁ tab le",
    "the" -> "▁ the", "value" -> "▁ val ue", "vector" -> "▁ vec tor",
    "window" -> "▁ win dow")

  private val unigramEncode: Q = (s, dir) => {
    val singles = ("abcdefghijklmnopqrstuvwxyz".map(_.toString) :+
      graft.ops.UnigramLm.Boundary)
    val pieces = (singles ++ unigramPieces).map(_ -> -1000L).toMap
    val model = graft.ops.UnigramLm.Model(pieces, maxPieceLen = 4)
    graft.ops.UnigramLm.encode(Tables.load(s, dir, "documents"),
        "doc_id", "text", model)
      .select(col("doc_id"), col("n_uni"),
        md5(concat_ws(" ", col("uni_tokens"))).as("tok_fp"))
  }
  private val unigramEncodeSql = {
    val cases = unigramSegments
      .map { case (w, seg) => s"WHEN '$w' THEN '$seg'" }
      .mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS ws
       |  FROM documents WHERE text IS NOT NULL),
       |seg AS (
       |  SELECT doc_id, r.p AS pos,
       |    -- Words outside the closed 31-word corpus vocabulary (the
       |    -- scale generators' replica/cohort tokens: rep<d+>, k<d+>)
       |    -- degrade to boundary + per-codepoint pieces, exactly the
       |    -- engine's OOV rule. Valid because those tokens contain no
       |    -- multi-codepoint piece as a substring — a cheaper DP path
       |    -- the char split couldn't see.
       |    CASE ws[r.p] $cases
       |      ELSE '▁ ' || array_to_string(string_split(ws[r.p], ''), ' ')
       |    END AS s
       |  FROM t, unnest(range(1, len(ws) + 1)) AS r(p)),
       |j AS (
       |  SELECT doc_id, string_agg(s, ' ' ORDER BY pos) AS stream
       |  FROM seg GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(len(string_split(j.stream, ' ')), 0) AS BIGINT) AS n_uni,
       |  md5(coalesce(j.stream, '')) AS tok_fp
       |FROM documents d LEFT JOIN j USING (doc_id)""".stripMargin
  }

  // Token-entropy quality signal (diversity / repetition): Shannon
  // entropy of the per-document token distribution in bits, via the
  // identity H = (ln n − Σ cnt·ln cnt / n) / ln 2 — integer counts
  // into ln, one fewer division than the p·ln p form, so both engines
  // compute the same expression tree over the same exact integers.
  // Two doc-keyed partial-aggregable shuffles; rounded to 4 places
  // (the double sums reassociate across partitions; term magnitudes
  // make a 5e-5 flip practically impossible, same stance as bm25).
  private val entropy: Q = (s, dir) => {
    val toks = Tables.load(s, dir, "documents")
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
    val counts = toks.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(col("doc_id")).agg(sum(col("cnt")).as("n"))
    counts.join(totals, "doc_id")
      .groupBy(col("doc_id"), col("n"))
      .agg(sum(col("cnt") * log(col("cnt"))).as("__s"))
      .select(col("doc_id"),
        round((log(col("n")) - col("__s") / col("n")) / log(lit(2.0)), 4)
          .as("token_entropy"))
  }
  private val entropySql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS t
      |  FROM documents WHERE trim(text) <> ''),
      |c AS (SELECT doc_id, t, count(*) AS cnt FROM tok GROUP BY doc_id, t),
      |n AS (SELECT doc_id, sum(cnt) AS n FROM c GROUP BY doc_id)
      |SELECT c.doc_id,
      |  round((ln(n.n) - sum(c.cnt * ln(c.cnt)) / n.n) / ln(2.0), 4) AS token_entropy
      |FROM c JOIN n USING (doc_id) GROUP BY c.doc_id, n.n""".stripMargin

  // Corpus heavy hitters: exact top-20 bigrams (ground truth) probed
  // against a 4×1024 count-min sketch built with the md5 family — the
  // oracle replays cells and estimates; overcount_ok is the CMS
  // one-sided guarantee (estimates never undercount).
  private val ngramTopk: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val stream = graft.ops.CountMin.ngramStream(docs, "doc_id", "text", n = 2)
    // ONE stream scan + ONE gram-keyed aggregate feed BOTH halves: the
    // exact counts the top-k screen needs anyway seed the sketch as a
    // weighted build (byte-identical cells — sum over occurrences ==
    // sum over distinct × count), so the portable md5 family hashes
    // each DISTINCT gram once instead of every occurrence, and the
    // tokenize pass stops running twice. The exact top-20 is collected
    // to a LITERAL frame: it seeds both the estimate probe and the
    // final join, and as a plan subtree it would re-run the aggregate
    // once per consumer.
    val counts = stream.groupBy(col("g")).agg(count(lit(1)).as("exact_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exactRows = counts
      .orderBy(col("exact_n").desc, col("g")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = exactRows.toSeq.toDF("g", "exact_n")
    val sk = graft.ops.CountMin.sketchWeighted(counts, "g", "exact_n",
      depth = 4, width = 1024, family = graft.ops.Md5Family)
    val est = graft.ops.CountMin.estimate(sk, exact.select("g"), "g",
      depth = 4, width = 1024, family = graft.ops.Md5Family)
    exact.join(est, Seq("g"))
      .select(col("g"), col("exact_n"), col("est_n"),
        (col("est_n") >= col("exact_n")).as("overcount_ok"))
  }

  private val ngramTopkSql =
    """WITH d AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
      |  FROM documents WHERE trim(text) <> ''),
      |gs AS (
      |  SELECT unnest(list_transform(range(len(toks) - 1),
      |    i -> toks[i+1] || ' ' || toks[i+2])) AS g
      |  FROM d WHERE len(toks) >= 2),
      |exact AS (
      |  SELECT g, count(*) AS exact_n FROM gs GROUP BY g
      |  ORDER BY exact_n DESC, g LIMIT 20),
      |rows4 AS (SELECT unnest(range(0, 4)) AS cm_row),
      |cells AS (
      |  SELECT cm_row,
      |    ('0x' || substr(md5('0:' || CAST(cm_row AS VARCHAR) || '#' || g), 1, 15))::BIGINT
      |      % 1024 AS cm_col,
      |    count(*) AS cm_cnt
      |  FROM gs CROSS JOIN rows4
      |  GROUP BY 1, 2),
      |est AS (
      |  SELECT e.g, min(coalesce(c.cm_cnt, 0)) AS est_n
      |  FROM exact e CROSS JOIN rows4 r
      |  LEFT JOIN cells c ON c.cm_row = r.cm_row AND c.cm_col =
      |    ('0x' || substr(md5('0:' || CAST(r.cm_row AS VARCHAR) || '#' || e.g), 1, 15))::BIGINT
      |      % 1024
      |  GROUP BY e.g)
      |SELECT exact.g, exact_n, est_n, est_n >= exact_n AS overcount_ok
      |FROM exact JOIN est USING (g)""".stripMargin

  // Stupid-backoff trigram LM (ops.TextRank.trigramStupidBackoff):
  // counts fit on sources src0–src4, scored on the WHOLE corpus so the
  // backoff chain genuinely fires (a corpus scored on its own counts
  // never backs off). α = 0.4, Brants et al.'s published constant.
  private val trigramBackoff: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    graft.ops.TextRank.trigramStupidBackoff(
        docs.filter(col("source").isin("src0", "src1", "src2", "src3", "src4")),
        docs, idCol = "doc_id", textCol = "text")
      .select(col("doc_id"), round(col("mean_logprob"), 4).as("mean_logprob"),
        col("n_trigrams"))
  }
  private val trigramBackoffSql =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                t -> t <> '') AS ts
      |  FROM documents),
      |f AS (SELECT * FROM d WHERE source IN ('src0','src1','src2','src3','src4')),
      |tri AS (
      |  SELECT p.w1 AS w1, p.w2 AS w2, p.w3 AS w3, count(*) AS c3 FROM (
      |    SELECT unnest(list_transform(range(1, len(ts) - 1),
      |      i -> struct_pack(w1 := ts[i], w2 := ts[i+1], w3 := ts[i+2]))) AS p
      |    FROM f) u GROUP BY 1, 2, 3),
      |big AS (
      |  SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c12 FROM (
      |    SELECT unnest(list_transform(range(1, len(ts)),
      |      i -> struct_pack(w1 := ts[i], w2 := ts[i+1]))) AS p
      |    FROM f) u GROUP BY 1, 2),
      |uni AS (
      |  SELECT t AS w, count(*) AS cu
      |  FROM (SELECT unnest(ts) AS t FROM f) u GROUP BY t),
      |tot AS (SELECT count(*) AS n FROM (SELECT unnest(ts) AS t FROM f) u),
      |dtri AS (
      |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2, p.w3 AS w3, count(*) AS n3 FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
      |      i -> struct_pack(w1 := ts[i], w2 := ts[i+1], w3 := ts[i+2]))) AS p
      |    FROM d) u GROUP BY 1, 2, 3, 4),
      |sc AS (
      |  SELECT doc_id, n3,
      |    CASE WHEN tri.c3 IS NOT NULL
      |           THEN ln(CAST(tri.c3 AS DOUBLE) / b12.c12)
      |         WHEN b23.c12 IS NOT NULL
      |           THEN ln(CAST(b23.c12 AS DOUBLE) / u2.cu) + ln(0.4)
      |         ELSE ln(CAST(coalesce(u3.cu, 1) AS DOUBLE) / tot.n) + 2 * ln(0.4)
      |    END AS s
      |  FROM dtri
      |  LEFT JOIN tri ON tri.w1 = dtri.w1 AND tri.w2 = dtri.w2 AND tri.w3 = dtri.w3
      |  LEFT JOIN big b12 ON b12.w1 = dtri.w1 AND b12.w2 = dtri.w2
      |  LEFT JOIN big b23 ON b23.w1 = dtri.w2 AND b23.w2 = dtri.w3
      |  LEFT JOIN uni u2 ON u2.w = dtri.w2
      |  LEFT JOIN uni u3 ON u3.w = dtri.w3, tot)
      |SELECT doc_id, round(sum(n3 * s) / sum(n3), 4) AS mean_logprob,
      |  CAST(sum(n3) AS BIGINT) AS n_trigrams
      |FROM sc GROUP BY doc_id""".stripMargin

  // CCNet-style head/middle/tail perplexity partition (ops.Binning
  // .labeledPartition over ops.TextRank.bigramLogProb): per-language
  // WEIGHTED shares 20/30/50, boundaries located on the ROUNDED score
  // (the same 4-digit rounding the text_bigram_lm oracle proves
  // hash-stable, so a 1-ulp cross-engine drift cannot reorder the
  // boundary rank walk).
  private val ccnetBuckets: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val scored = graft.ops.TextRank.bigramLogProb(docs, "doc_id", "text")
      .select(col("doc_id"), round(col("mean_logprob"), 4).as("lm"))
    // null-lang rows are EXCLUDED on both sides: labeledPartition
    // would keep them with a null bucket (left join), but the oracle's
    // USING (lang) join drops them — filter here so the gate cannot
    // diverge if a future testdata generation introduces null langs.
    val withLang = docs.select(col("doc_id"), col("lang"))
      .filter(col("lang").isNotNull)
      .join(scored, Seq("doc_id"))
    graft.ops.Binning.labeledPartition(withLang, "lang", "lm", Seq("doc_id"),
        Seq(("tail", 2), ("middle", 3), ("head", 5)))
      .select(col("doc_id"), col("lang"), col("lm"), col("bucket"))
  }
  private val ccnetBucketsSql =
    """WITH d AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                t -> t <> '') AS ts
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
      |    i -> struct_pack(w1 := ts[i], w2 := ts[i+1]))) AS p
      |  FROM d),
      |bigrams AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
      |docbi AS (
      |  SELECT doc_id, w1, w2, count(*) AS n FROM bigrams GROUP BY doc_id, w1, w2),
      |uni AS (
      |  SELECT t AS w1, count(*) AS c1 FROM (SELECT unnest(ts) AS t FROM d) u
      |  GROUP BY t),
      |v AS (SELECT count(*) AS vs FROM uni),
      |bi AS (SELECT w1, w2, CAST(sum(n) AS BIGINT) AS c2 FROM docbi GROUP BY w1, w2),
      |scored AS (
      |  SELECT doc_id,
      |    round(sum(n * ln(CAST(c2 + 1 AS DOUBLE) / (c1 + vs))) / sum(n), 4) AS lm
      |  FROM docbi JOIN bi USING (w1, w2) JOIN uni USING (w1), v
      |  GROUP BY doc_id),
      |wl AS (
      |  SELECT s.doc_id, documents.lang, s.lm
      |  FROM scored s JOIN documents ON documents.doc_id = s.doc_id),
      |ranked AS (
      |  SELECT lang, lm, doc_id,
      |    row_number() OVER (PARTITION BY lang ORDER BY lm, doc_id) AS r,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM wl),
      |bounds AS (
      |  SELECT lang,
      |    max(CASE WHEN r = CAST(ceil(n * 0.2) AS BIGINT) THEN lm END) AS q1,
      |    max(CASE WHEN r = CAST(ceil(n * 0.5) AS BIGINT) THEN lm END) AS q2
      |  FROM ranked GROUP BY lang)
      |SELECT w.doc_id, w.lang, w.lm,
      |  CASE (CASE WHEN w.lm > b.q1 THEN 1 ELSE 0 END)
      |     + (CASE WHEN w.lm > b.q2 THEN 1 ELSE 0 END)
      |    WHEN 0 THEN 'tail' WHEN 1 THEN 'middle' ELSE 'head' END AS bucket
      |FROM wl w JOIN bounds b USING (lang)""".stripMargin

  // The COMPOSED CCNet path in one query: trigram backoff LM fit on
  // the src0–src4 reference slice → per-language weighted
  // head/middle/tail cuts on the rounded score. Both stages are
  // individually oracle-proven (text_trigram_backoff,
  // text_ccnet_buckets); the composition chains their CTEs so the
  // end-to-end hash must match too.
  private val ccnetPipeline: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val scored = graft.ops.TextRank.trigramStupidBackoff(
        docs.filter(col("source").isin("src0", "src1", "src2", "src3", "src4")),
        docs, idCol = "doc_id", textCol = "text")
      .select(col("doc_id"), round(col("mean_logprob"), 4).as("lm"))
    val withLang = docs.select(col("doc_id"), col("lang"))
      .filter(col("lang").isNotNull)
      .join(scored, Seq("doc_id"))
    graft.ops.Binning.labeledPartition(withLang, "lang", "lm", Seq("doc_id"),
        Seq(("tail", 2), ("middle", 3), ("head", 5)))
      .select(col("doc_id"), col("lang"), col("lm"), col("bucket"))
  }
  private val ccnetPipelineSql =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                t -> t <> '') AS ts
      |  FROM documents),
      |f AS (SELECT * FROM d WHERE source IN ('src0','src1','src2','src3','src4')),
      |tri AS (
      |  SELECT p.w1 AS w1, p.w2 AS w2, p.w3 AS w3, count(*) AS c3 FROM (
      |    SELECT unnest(list_transform(range(1, len(ts) - 1),
      |      i -> struct_pack(w1 := ts[i], w2 := ts[i+1], w3 := ts[i+2]))) AS p
      |    FROM f) u GROUP BY 1, 2, 3),
      |big AS (
      |  SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c12 FROM (
      |    SELECT unnest(list_transform(range(1, len(ts)),
      |      i -> struct_pack(w1 := ts[i], w2 := ts[i+1]))) AS p
      |    FROM f) u GROUP BY 1, 2),
      |uni AS (
      |  SELECT t AS w, count(*) AS cu
      |  FROM (SELECT unnest(ts) AS t FROM f) u GROUP BY t),
      |tot AS (SELECT count(*) AS n FROM (SELECT unnest(ts) AS t FROM f) u),
      |dtri AS (
      |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2, p.w3 AS w3, count(*) AS n3 FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
      |      i -> struct_pack(w1 := ts[i], w2 := ts[i+1], w3 := ts[i+2]))) AS p
      |    FROM d) u GROUP BY 1, 2, 3, 4),
      |sc AS (
      |  SELECT doc_id, n3,
      |    CASE WHEN tri.c3 IS NOT NULL
      |           THEN ln(CAST(tri.c3 AS DOUBLE) / b12.c12)
      |         WHEN b23.c12 IS NOT NULL
      |           THEN ln(CAST(b23.c12 AS DOUBLE) / u2.cu) + ln(0.4)
      |         ELSE ln(CAST(coalesce(u3.cu, 1) AS DOUBLE) / tot.n) + 2 * ln(0.4)
      |    END AS s
      |  FROM dtri
      |  LEFT JOIN tri ON tri.w1 = dtri.w1 AND tri.w2 = dtri.w2 AND tri.w3 = dtri.w3
      |  LEFT JOIN big b12 ON b12.w1 = dtri.w1 AND b12.w2 = dtri.w2
      |  LEFT JOIN big b23 ON b23.w1 = dtri.w2 AND b23.w2 = dtri.w3
      |  LEFT JOIN uni u2 ON u2.w = dtri.w2
      |  LEFT JOIN uni u3 ON u3.w = dtri.w3, tot),
      |scored AS (
      |  SELECT doc_id, round(sum(n3 * s) / sum(n3), 4) AS lm
      |  FROM sc GROUP BY doc_id),
      |wl AS (
      |  SELECT s.doc_id, documents.lang, s.lm
      |  FROM scored s JOIN documents ON documents.doc_id = s.doc_id
      |  WHERE documents.lang IS NOT NULL),
      |ranked AS (
      |  SELECT lang, lm, doc_id,
      |    row_number() OVER (PARTITION BY lang ORDER BY lm, doc_id) AS r,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM wl),
      |bounds AS (
      |  SELECT lang,
      |    max(CASE WHEN r = CAST(ceil(n * 0.2) AS BIGINT) THEN lm END) AS q1,
      |    max(CASE WHEN r = CAST(ceil(n * 0.5) AS BIGINT) THEN lm END) AS q2
      |  FROM ranked GROUP BY lang)
      |SELECT w.doc_id, w.lang, w.lm,
      |  CASE (CASE WHEN w.lm > b.q1 THEN 1 ELSE 0 END)
      |     + (CASE WHEN w.lm > b.q2 THEN 1 ELSE 0 END)
      |    WHEN 0 THEN 'tail' WHEN 1 THEN 'middle' ELSE 'head' END AS bucket
      |FROM wl w JOIN bounds b USING (lang)""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("pipeline_ccnet", ccnetPipeline, Some(ccnetPipelineSql)),
    Entry("text_ngram_topk", ngramTopk, Some(ngramTopkSql)),
    Entry("text_vocab", vocab, Some(vocabSql)),
    Entry("text_encode", encode, Some(encodeSql)),
    Entry("text_oov", oov, Some(oovSql)),
    Entry("text_pii_redact", piiRedact, Some(piiRedactSql)),
    Entry("text_inverted_index", inverted, Some(invertedSql)),
    Entry("text_repetition", repetition, Some(repetitionSql)),
    Entry("text_lm_score", lmScore, Some(lmScoreSql)),
    Entry("text_bigram_lm", bigramLm, Some(bigramLmSql)),
    Entry("text_chunk", chunks, Some(chunksSql)),
    Entry("text_fuzzy_join", fuzzy, Some(fuzzySql)),
    Entry("text_bm25", bm25, Some(bm25Sql)),
    Entry("text_nfc_fingerprint", normalize, Some(normalizeSql)),
    Entry("text_edit_distance", editDist, Some(editDistSql)),
    Entry("text_token_count", tokCount, Some(tokCountSql)),
    Entry("text_quality", quality, Some(qualitySql)),
    Entry("text_langid", langid, Some(langidSql)),
    Entry("text_fingerprint", fingerprint, Some(fingerprintSql)),
    Entry("text_hash_sample", hashSample, Some(hashSampleSql)),
    Entry("text_stratified_sample", stratified, Some(stratifiedSql)),
    Entry("text_pack_sequences", pack, Some(packSql)),
    Entry("text_weighted_sample", weighted, Some(weightedSql)),
    Entry("text_mix_corpora", mix, Some(mixSql)),
    Entry("text_shuffle", shuffleQ, Some(shuffleSql)),
    Entry("text_quality_bins", qualityBins, Some(qualityBinsSql)),
    Entry("text_bpe", bpe, None),
    Entry("text_compression_ratio", compressionRatio, None),
    Entry("text_bpe_encode", bpeEncode, Some(bpeEncodeSql)),
    Entry("text_unigram", unigram, None),
    Entry("text_unigram_encode", unigramEncode, Some(unigramEncodeSql)),
    Entry("text_entropy", entropy, Some(entropySql)),
    Entry("text_trigram_backoff", trigramBackoff, Some(trigramBackoffSql)),
    Entry("text_ccnet_buckets", ccnetBuckets, Some(ccnetBucketsSql)),
  )
}
