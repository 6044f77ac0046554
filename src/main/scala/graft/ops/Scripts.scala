package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode-script profiling — the multilingual-intake sibling of the
  * n-gram language guess ([[CorpusPrep.langGuess]]): BEFORE a language
  * can be guessed from stopwords, a corpus router needs to know which
  * WRITING SYSTEM a document even uses (stopword lists are per-script),
  * and mixed-script documents are a classic spam/mojibake signal
  * (CCNet routes by fasttext language id, which itself keys off script
  * blocks first).
  *
  * Counts are computed by remove-and-diff (`length(t) −
  * length(regexp_replace(t, "\\p{IsX}+", ""))`) over Unicode script
  * properties — row-local codegen'd expressions, zero shuffles,
  * streaming-safe as-is. Script property classes exist in both
  * java.util.regex (`\p{IsLatin}`) and RE2 (`\p{Latin}`), so an
  * oracle engine replays the same counts; both `length`s count
  * codepoints, so the diff is codepoint-exact on the BMP (astral
  * scripts would need codepoint-pair care — out of scope for the
  * four classes here).
  *
  * `dominant` is decided over the four letter scripts by a FIXED
  * priority order on ties (latin > cyrillic > greek > han), so the
  * label is deterministic on any engine — never an argmax over float
  * ratios. Null text yields null counts and a null dominant.
  */
object Scripts {

  /** The profiled scripts, in tie-priority order, with their java.regex
    * character classes. `other` (= everything else: spaces, digits,
    * punctuation, unprofiled scripts) is derived, not matched.
    */
  val profiled: Seq[(String, String)] = Seq(
    "latin" -> "\\p{IsLatin}",
    "cyrillic" -> "\\p{IsCyrillic}",
    "greek" -> "\\p{IsGreek}",
    "han" -> "\\p{IsHan}")

  private def countOf(text: Column, cls: String): Column =
    length(text) - length(regexp_replace(text, cls + "+", ""))

  /** Append `latin_n/cyrillic_n/greek_n/han_n/other_n` codepoint counts
    * and the `dominant_script` label to `df`.
    */
  def withScriptProfile(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val counts = profiled.map { case (name, cls) => name -> countOf(t, cls) }
    val known = counts.map(_._2).reduce(_ + _)
    val byName = counts.toMap
    val Seq(lat, cyr, grk, han) = profiled.map { case (n, _) => byName(n) }
    val dominant =
      when(lat >= cyr && lat >= grk && lat >= han, "latin")
        .when(cyr >= grk && cyr >= han, "cyrillic")
        .when(grk >= han, "greek")
        .otherwise("han")
    counts.foldLeft(df) { case (acc, (name, c)) =>
      acc.withColumn(s"${name}_n", c)
    }
      .withColumn("other_n", length(t) - known)
      .withColumn("dominant_script", when(t.isNull, lit(null)).otherwise(dominant))
  }
}
