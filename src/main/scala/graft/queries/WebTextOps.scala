package graft.queries

import java.nio.charset.{Charset, StandardCharsets}

import graft.Tables
import graft.ops.{Html, Mojibake}
import org.apache.spark.sql.functions._

/** Harness entries for the raw-web text-repair surface
  * ([[graft.ops.Html]], [[graft.ops.Mojibake]]).
  *
  * Both entries SYNTHESIZE the corruption from doc attributes and let
  * the oracle derive the expected CLEAN text independently — by
  * attribute math over `doc_id`/`text`, never by replaying the
  * operator's rules — so any extraction/repair rule that is wrong
  * breaks the hash.
  */
object WebTextOps {
  import Catalog.{Entry, Q}

  // ---- text_html_extract: wrap each doc in a full page whose
  // non-content carries every classic stripper trap (a '<' and a
  // "</div>" inside a JS string, a '>' inside a style rule and inside
  // a quoted attribute, markup inside a comment, entities incl. the
  // &amp;-last case). Expected visible text is pure attribute math.
  private val htmlExtract: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val g = pmod(col("doc_id"), lit(7)).cast("string")
    val page = concat(
      lit("<html><head><title>D"), col("doc_id").cast("string"),
      lit("</title>"),
      lit("<script type=\"text/javascript\">if(x<2){s=\"</div>\";}</script>"),
      lit("<style media=\"all\">p>b{}</style></head>"),
      lit("<body data-note=\"a>b\"><!-- hidden <b>x</b> -->"),
      lit("<h1 class=\"t\">H"), g, lit("</h1><p>"),
      col("text"),
      lit("</p><p>tail&nbsp;&amp; done &lt;eof&gt;</p></body></html>"))
    docs.select(col("doc_id"), Html.extractText(page).as("extracted"))
  }
  private val htmlExtractSql =
    """SELECT doc_id,
      |  'D' || CAST(doc_id AS VARCHAR) || ' H' ||
      |  CAST(doc_id % 7 AS VARCHAR) || ' ' || text ||
      |  ' tail & done <eof>' AS extracted
      |FROM documents""".stripMargin

  /** The corruptions [[mojibake]] injects, keyed by `doc_id % 8`.
    * Branches 0-5 are codec-corrupted and must come back exact;
    * branch 6 is a RAW lone-lead suffix (structurally invalid UTF-8 —
    * repair must refuse); branch 7 is pure ASCII (fixed point).
    */
  private val mojiPhrases: Seq[String] = Seq(
    "café",
    "naïve — touché",
    "Grüße",
    "€99 “quoted„",
    "кофе",
    "😀 emoji 📈")

  // ---- text_fix_mojibake: append the cp1252 mis-decode of a phrase
  // (corrupted HERE with the JVM's own windows-1252 codec — an
  // implementation independent of the operator's translate+Latin-1
  // route) and require the repair to return the original phrase.
  private val mojibake: Q = (s, dir) => {
    val cp1252 = Charset.forName("windows-1252")
    val docs = Tables.load(s, dir, "documents")
    val g = pmod(col("doc_id"), lit(8))
    val suffix = mojiPhrases.zipWithIndex.foldLeft(
      when(g === 6, lit(" Ã solo")).otherwise(lit(" plain tail"))) {
      case (acc, (p, i)) =>
        when(g === i,
          lit(" " + new String(p.getBytes(StandardCharsets.UTF_8), cp1252)))
          .otherwise(acc)
    }
    docs.select(col("doc_id"),
      Mojibake.fixMojibake(concat(col("text"), suffix)).as("fixed"),
      Mojibake.isMojibake(concat(col("text"), suffix)).as("was_moji"))
  }
  private val mojibakeSql = {
    val cases = mojiPhrases.zipWithIndex
      .map { case (p, i) => s"WHEN $i THEN ' ${p.replace("'", "''")}'" }
      .mkString(" ")
    s"""SELECT doc_id,
       |  text || (CASE doc_id % 8 $cases
       |           WHEN 6 THEN ' Ã solo' ELSE ' plain tail' END) AS fixed,
       |  (doc_id % 8) < 6 AS was_moji
       |FROM documents""".stripMargin
  }

  // ---- text_dedup_lines: in-document repeated-line collapse
  // (graft.ops.Dedup.dedupLinesWithinDoc). The word-soup docs are one
  // line, so line structure is synthesized: a boilerplate line is
  // injected after every 3-word run — the classic share-prompt shape
  // this rule exists for — giving each doc MANY copies of the same
  // line (plus whatever natural 3-word content-line repeats occur).
  // Only the first occurrence of each line may survive, in order.
  private val lineBreak = "((?:\\S+ ){2}\\S+) "
  private val boiler = "share this article"
  private val dedupLines: Q = (s, dir) =>
    graft.ops.Dedup.dedupLinesWithinDoc(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          regexp_replace(col("text"), lineBreak, s"$$1\n$boiler\n").as("text")),
      "text")
  private val dedupLinesSql =
    s"""WITH docs AS (
       |  SELECT doc_id,
       |    regexp_replace(text, '((?:\\S+ ){2}\\S+) ',
       |      '\\1' || chr(10) || '$boiler' || chr(10), 'g') AS t
       |  FROM documents),
       |lines AS (
       |  SELECT doc_id,
       |    unnest(string_split(t, chr(10))) AS line,
       |    unnest(range(1, len(string_split(t, chr(10))) + 1)) AS pos
       |  FROM docs),
       |kept AS (
       |  SELECT doc_id, pos, line,
       |    row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
       |  FROM lines)
       |SELECT d.doc_id, k.text
       |FROM documents d LEFT JOIN (
       |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
       |  FROM kept WHERE rn = 1 GROUP BY doc_id) k
       |USING (doc_id)""".stripMargin

  // ---- text_script_detect: Unicode-script profiling
  // (graft.ops.Scripts). The docs are pure [a-z ] Latin, so non-Latin
  // material is synthesized: doc_id % 4 picks a Cyrillic / Greek / Han
  // rpad suffix sized from length(text). The oracle derives every
  // count from attribute math (Latin letters = non-space chars of the
  // base text; suffix counts = the rpad lengths) and the dominant
  // label from the same integer comparisons — it never runs a script
  // regex, so a wrong script class or a codepoint/codeunit confusion
  // on the Spark side breaks the hash.
  private val scriptDetect: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val m = pmod(col("doc_id"), lit(4))
    val suffix = when(m === 1,
        expr("rpad('', CAST(length(text) / 2 AS INT), 'привет')"))
      .when(m === 2, expr("rpad('', CAST(length(text) AS INT), 'γεια')"))
      .when(m === 3, expr("rpad('', CAST(length(text) AS INT), '你好世界')"))
      .otherwise(lit(""))
    graft.ops.Scripts.withScriptProfile(
        docs.select(col("doc_id"), concat(col("text"), suffix).as("text")),
        "text")
      .select(col("doc_id"),
        col("latin_n").cast("long").as("latin_n"),
        col("cyrillic_n").cast("long").as("cyrillic_n"),
        col("greek_n").cast("long").as("greek_n"),
        col("han_n").cast("long").as("han_n"),
        col("other_n").cast("long").as("other_n"),
        col("dominant_script"))
  }
  // The oracle counts by the SAME Unicode script properties as the
  // engine (RE2's \p{Latin} ≙ java.regex's \p{IsLatin} on BMP text —
  // the Scripts scaladoc contract), not by a letters-plus-spaces
  // dataset assumption: the scale generators append digit-bearing
  // replica/cohort tokens (" rep7", "k3") which are OTHER, not Latin,
  // and the earlier analytic shortcut miscounted exactly those rows
  // at the 10× rehearsal.
  private val scriptDetectSql =
    """WITH aug AS (
      |  SELECT doc_id,
      |    text || CASE doc_id % 4
      |      -- // not /: DuckDB's double→INT cast ROUNDS half-up where
      |      -- Spark's truncates, so an odd length(text) would pad one
      |      -- extra Cyrillic codepoint on the oracle side only.
      |      WHEN 1 THEN rpad('', CAST(length(text) // 2 AS INT), 'привет')
      |      WHEN 2 THEN rpad('', CAST(length(text) AS INT), 'γεια')
      |      WHEN 3 THEN rpad('', CAST(length(text) AS INT), '你好世界')
      |      ELSE '' END AS t
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, length(t) AS n,
      |    length(t) - length(regexp_replace(t, '\p{Latin}+', '', 'g')) AS lat,
      |    length(t) - length(regexp_replace(t, '\p{Cyrillic}+', '', 'g')) AS cyr,
      |    length(t) - length(regexp_replace(t, '\p{Greek}+', '', 'g')) AS grk,
      |    length(t) - length(regexp_replace(t, '\p{Han}+', '', 'g')) AS han
      |  FROM aug)
      |SELECT doc_id,
      |  CAST(lat AS BIGINT) AS latin_n,
      |  CAST(cyr AS BIGINT) AS cyrillic_n,
      |  CAST(grk AS BIGINT) AS greek_n,
      |  CAST(han AS BIGINT) AS han_n,
      |  CAST(n - lat - cyr - grk - han AS BIGINT) AS other_n,
      |  CASE WHEN n IS NULL THEN NULL
      |       WHEN lat >= cyr AND lat >= grk AND lat >= han THEN 'latin'
      |       WHEN cyr >= grk AND cyr >= han THEN 'cyrillic'
      |       WHEN grk >= han THEN 'greek'
      |       ELSE 'han' END AS dominant_script
      |FROM c""".stripMargin

  // ---- web_boilerplate_lines: per-site frequency-threshold
  // boilerplate removal (graft.ops.Boilerplate.domainBoilerplate),
  // the RefinedWeb rule the in-doc/global siblings can't express.
  //
  // ORACLE COUPLING: the oracle's line list keeps the document's own
  // `text` as ONE atomic element, while the Spark side splits the
  // concatenated text on \n. Equality holds because driver testdata
  // text contains no embedded newlines (word-soup lines) — text WITH
  // newlines would change line granularity/positions/frequencies on
  // the Spark side only. The coupling fails LOUD (hash mismatch), and
  // this pin is the early warning if the driver ever regenerates
  // testdata with multi-line documents.
  //
  // Line structure is synthesized per SOURCE (the site key): a
  // newsletter line in 100% of the site's docs (removed), the doc's
  // own soup (kept), a promo line in ~1/3 of docs (kept, under the
  // 500-milli threshold) and a footer line in ~3/5 (removed). The
  // oracle replays the frequency DEFINITION over line bodies in
  // DuckDB — the Spark side works on md5 digests and a different
  // join topology, so a threshold, distinct-doc or reassembly error
  // breaks the hash.
  private val boilerLines: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val l0 = concat(lit("subscribe "), col("source"), lit(" newsletter"))
    val l2 = when(pmod(col("doc_id"), lit(3)) === 0,
      concat(lit("promo "), col("source")))
    val l3 = when(pmod(col("doc_id"), lit(5)) < 3,
      concat(lit("footer "), col("source")))
    graft.ops.Boilerplate.domainBoilerplate(
        docs.select(col("doc_id"), col("source"),
          concat_ws("\n", l0, col("text"), l2, l3).as("text")),
        "doc_id", "source", "text")
      .select(col("id").as("doc_id"), col("text"))
  }
  private val boilerLinesWith =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    list_filter([
      |      'subscribe ' || source || ' newsletter',
      |      text,
      |      CASE WHEN doc_id % 3 = 0 THEN 'promo ' || source END,
      |      CASE WHEN doc_id % 5 < 3 THEN 'footer ' || source END
      |    ], x -> x IS NOT NULL) AS ls
      |  FROM documents),
      |e AS (SELECT doc_id, source, unnest(ls) AS line,
      |      unnest(range(1, len(ls) + 1)) AS pos FROM d),
      |f AS (SELECT source, line, count(DISTINCT doc_id) AS df
      |      FROM e GROUP BY 1, 2),
      |n AS (SELECT source, count(*) AS docs FROM d GROUP BY 1),
      |b AS (SELECT f.source, f.line FROM f JOIN n USING (source)
      |      WHERE df >= 2 AND df * 1000 >= 500 * docs)""".stripMargin
  private val boilerLinesSql =
    s"""$boilerLinesWith,
       |kept AS (SELECT e.doc_id, e.pos, e.line FROM e
       |         ANTI JOIN b ON e.source = b.source AND e.line = b.line)
       |SELECT d.doc_id, coalesce(k.text, '') AS text
       |FROM d LEFT JOIN (
       |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
       |  FROM kept GROUP BY doc_id) k USING (doc_id)""".stripMargin

  // ---- web_boilerplate_set: the audit artifact — WHICH lines are a
  // site's boilerplate, with frequencies (same threshold rule).
  private val boilerSet: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val l0 = concat(lit("subscribe "), col("source"), lit(" newsletter"))
    val l2 = when(pmod(col("doc_id"), lit(3)) === 0,
      concat(lit("promo "), col("source")))
    val l3 = when(pmod(col("doc_id"), lit(5)) < 3,
      concat(lit("footer "), col("source")))
    graft.ops.Boilerplate.domainBoilerplateSet(
        docs.select(col("doc_id"), col("source"),
          concat_ws("\n", l0, col("text"), l2, l3).as("text")),
        "doc_id", "source", "text")
      .withColumnRenamed("domain", "source")
  }
  private val boilerSetSql =
    s"""$boilerLinesWith
       |SELECT b.source, b.line,
       |  f.df AS doc_freq, n.docs AS domain_docs
       |FROM b JOIN f ON b.source = f.source AND b.line = f.line
       |JOIN n ON b.source = n.source""".stripMargin

  def entries: Seq[Entry] = Seq(
    Entry("text_html_extract", htmlExtract, Some(htmlExtractSql)),
    Entry("text_fix_mojibake", mojibake, Some(mojibakeSql)),
    Entry("text_dedup_lines", dedupLines, Some(dedupLinesSql)),
    Entry("text_script_detect", scriptDetect, Some(scriptDetectSql)),
    Entry("web_boilerplate_lines", boilerLines, Some(boilerLinesSql)),
    Entry("web_boilerplate_set", boilerSet, Some(boilerSetSql)),
  )
}
