package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions.{lower_root => lowerRoot}

/** The C4 line-level cleaning battery (Raffel et al. 2020, §2.2 — the
  * other canonical web-corpus filter next to [[GopherRules]]): where
  * Gopher judges a document by whole-document counts, C4 first judges
  * each LINE, rewrites the document to its surviving lines, and only
  * then decides whether enough of the document survived.
  *
  * Line rules (a line is kept iff ALL hold):
  *  - ends with a terminal marker (C4: `.`, `!`, `?`, `"`);
  *  - has at least `minLineWords` words (C4: 3);
  *  - contains none of `lineBlocklist` (C4: "javascript", cookie/
  *    policy boilerplate), case-insensitively.
  *
  * Document rules:
  *  - contains none of `docBlocklist` (C4: "lorem ipsum", `{` — the
  *    code smell), case-insensitively, judged on the RAW text;
  *  - at least `minKeptLines` lines survive (C4 drops pages under 3
  *    sentences).
  *
  * Every rule is a string/array predicate — no counts that could
  * round, no floats — so audit columns and the rewritten text are
  * bit-identical on any engine and the whole battery is
  * oracle-checkable.
  *
  * The separator and marker sets are configuration, not constants:
  * the C4 defaults encode English web text (newline lines, sentence
  * punctuation), and corpora without those markers (transcripts,
  * code, the synthetic harness tables) tune them to whatever line
  * structure they do have — the machinery is identical.
  *
  * Scale shape: one row-local projection over the scan — split,
  * filter, rejoin; no shuffle, no state, no join. The same
  * expressions drive a Structured Streaming filter unchanged.
  */
object C4Rules {

  /** Rule knobs; defaults are C4's published values. `lineSep` is a
    * regex (the default splits on any newline run).
    */
  final case class Rules(
      lineSep: String = "\\r?\\n+",
      joinSep: String = "\n",
      terminalMarkers: Seq[String] = Seq(".", "!", "?", "\""),
      minLineWords: Int = 3,
      lineBlocklist: Seq[String] = Seq("javascript", "cookie"),
      docBlocklist: Seq[String] = Seq("lorem ipsum", "{"),
      minKeptLines: Int = 3) {
    require(minLineWords >= 0 && minKeptLines >= 0, "thresholds must be >= 0")
    require(terminalMarkers.nonEmpty, "need at least one terminal marker")
  }

  private def containsAny(c: Column, terms: Seq[String]): Column =
    terms.map(t => contains(lowerRoot(c), lit(t))).reduceOption(_ || _)
      .getOrElse(lit(false))

  /** All audit columns for a text column. Keys: n_lines (non-blank),
    * kept_lines, has_doc_block, keep, clean_text (kept lines joined
    * by `joinSep`; null when NO line survives — "no text" is null,
    * not "", which is also what a sequential oracle engine's
    * list-join returns for an empty list).
    */
  def signals(text: Column, r: Rules = Rules()): Map[String, Column] = {
    val lines = filter(transform(split(text, r.lineSep), l => trim(l)),
      l => l =!= "")
    val keptPred = (l: Column) => {
      val words = filter(split(l, "\\s+"), w => w =!= "")
      r.terminalMarkers.map(m => endswith(l, lit(m))).reduce(_ || _) &&
        size(words) >= r.minLineWords &&
        !containsAny(l, r.lineBlocklist)
    }
    val kept = filter(lines, keptPred)
    val nLines = coalesce(size(lines).cast("long"), lit(0L))
    val keptLines = coalesce(size(kept).cast("long"), lit(0L))
    val docBlock = coalesce(containsAny(text, r.docBlocklist), lit(false))
    Map(
      "n_lines" -> nLines,
      "kept_lines" -> keptLines,
      "has_doc_block" -> docBlock,
      "keep" -> (keptLines >= r.minKeptLines && !docBlock),
      "clean_text" -> when(size(kept) > 0, array_join(kept, r.joinSep)))
  }

  /** Per-document audit table: id + every signal. */
  def audit(df: DataFrame, idCol: String, textCol: String,
      r: Rules = Rules()): DataFrame = {
    val s = signals(col(textCol), r)
    val order = Seq("n_lines", "kept_lines", "has_doc_block", "keep", "clean_text")
    df.select(col(idCol) +: order.map(k => s(k).as(k)): _*)
  }

  /** The C4 rewrite: keep=true documents with `textCol` replaced by
    * the surviving lines (other columns pass through unchanged).
    */
  def clean(df: DataFrame, textCol: String, r: Rules = Rules()): DataFrame = {
    val s = signals(col(textCol), r)
    df.filter(s("keep"))
      .withColumn(textCol, s("clean_text"))
  }
}
