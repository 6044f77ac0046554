package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → visible-text extraction — the ingestion step a web corpus
  * runs before any quality/dedup work (the C4/CCNet pipelines start
  * from pre-extracted WET text; pipelines that start from raw HTML run
  * exactly this: drop non-content blocks, strip markup, decode
  * entities, normalize whitespace).
  *
  * Everything is a row-local chain of codegen'd `regexp_replace` /
  * `replace` calls — shuffle-free, whole-stage-codegen-friendly, and
  * (deliberately) free of lookbehind/backreference syntax so every
  * rule is replayable in an RE2-based engine for oracle checks.
  *
  * Rules, in order (order is semantics, not style):
  *  1. `<script>`/`<style>` BLOCKS go first — their character data is
  *     not visible text, and JS string literals legally contain `"<"`
  *     and even `"</div>"`, which a naive tag-stripper would mangle;
  *  2. comments next — they may contain markup (`<!-- <b>x</b> -->`)
  *     that must not survive as text;
  *  3. remaining tags → one space. The tag regex skips `>` inside
  *     single/double-quoted attribute values (`<body data-x="a>b">` is
  *     ONE tag), the classic naive-regex corruption;
  *  4. named entities decode AFTER tag stripping, so escaped markup
  *     (`&lt;b&gt;`) stays literal text instead of becoming a tag —
  *     and `&amp;` decodes LAST so `&amp;lt;` yields the literal
  *     `&lt;` exactly as a browser renders it. Numeric character
  *     references (`&#160;`) are NOT decoded (that needs a chr()
  *     computation no replace chain can express) — they pass through
  *     literally, pinned by spec;
  *  5. whitespace runs collapse to a single space, ends trimmed.
  *
  * Null html → null text (no parseable content has no text identity —
  * same stance as [[Urls.normalizeUrl]]).
  */
object Html {

  private val ScriptRe = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  private val StyleRe = "(?is)<style\\b[^>]*>.*?</style\\s*>"
  private val CommentRe = "(?s)<!--.*?-->"

  /** A tag: `<` or `</`, a name-ish start, then anything that is not a
    * quote or `>`, with whole quoted attribute values allowed to carry
    * `>` freely. No backreferences — RE2-safe.
    */
  private val TagRe =
    "(?s)</?[A-Za-z!][^>\"']*(?:(?:\"[^\"]*\"|'[^']*')[^>\"']*)*>"

  /** Named entities decoded, in application order. `&amp;` MUST stay
    * last (see object doc).
    */
  val entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&apos;" -> "'",
    "&amp;" -> "&")

  /** Anchor targets of an HTML column: the `href` value of every
    * `<a …>` tag with a quoted href, in document order, raw (relative
    * links, fragments and mailto: included —
    * [[graft.ops.LinkGraph.domainEdges]] filters to absolute http(s)
    * when building the web graph). One codegen'd
    * `regexp_extract_all`, RE2-safe like every rule here; null html →
    * null. The captured value excludes `>` as well as both quotes, so
    * a runaway value can NEVER escape its tag: an UNTERMINATED quote
    * (`<a href="http://a/x>…`) yields no link at all rather than a
    * garbage URL spanning into the following markup. Documented
    * approximations: unquoted hrefs are not matched (rare, and
    * unanchored matching would misparse `href=a>b`), a raw `>` in an
    * href skips it (illegal in a URI per RFC 3986), and an href
    * containing the OTHER quote character is TRUNCATED at it — the
    * one legal-but-rare case (`'` inside a double-quoted href) traded
    * away to keep the rule a single capture group (extract_all cannot
    * coalesce alternation groups).
    */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*?\\bhref\\s*=\\s*[\"']([^\"'>]*)[\"']"),
      lit(1))

  /** One anchor element: group 1 = quoted href (same value rules as
    * [[extractLinks]]), group 2 = inner HTML up to the nearest
    * `</a>`. Nested `<a>` is illegal in HTML, so non-greedy first-close
    * matching is the correct recovery everywhere.
    */
  private val AnchorRe =
    "(?is)<a\\b[^>]*?\\bhref\\s*=\\s*[\"']([^\"'>]*)[\"'][^>]*>(.*?)</a\\s*>"

  /** `(href, anchor)` pairs of an HTML column, in document order —
    * anchor TEXT is the retrieval signal ([[extractLinks]] keeps only
    * the targets): inner markup stripped, entities decoded (`&amp;`
    * last, as in [[extractText]]), whitespace collapsed. Two aligned
    * `regexp_extract_all` passes over ONE pattern (extract_all cannot
    * capture two groups at once; the same regex yields the same match
    * list, so `zip_with` pairs them exactly) — row-local and
    * codegen'd, RE2-replayable. An anchor missing its `</a>` close
    * yields NO pair here while [[extractLinks]] still yields the bare
    * target — the one intentional divergence, spec-pinned.
    */
  def extractAnchors(html: Column): Column = {
    val hrefs = regexp_extract_all(html, lit(AnchorRe), lit(1))
    val texts = regexp_extract_all(html, lit(AnchorRe), lit(2))
    zip_with(hrefs, texts, (h, t) => {
      val noTags = regexp_replace(t, TagRe, " ")
      val decoded = entities.foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
      struct(h.as("href"),
        trim(regexp_replace(decoded, "\\s+", " ")).as("anchor"))
    })
  }

  /** Visible text of an HTML column per the object doc. */
  def extractText(html: Column): Column = {
    val noBlocks =
      regexp_replace(
        regexp_replace(
          regexp_replace(html, ScriptRe, " "),
          StyleRe, " "),
        CommentRe, " ")
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    val decoded = entities.foldLeft(noTags) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
