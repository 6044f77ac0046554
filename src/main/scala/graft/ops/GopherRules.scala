package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions.{lower_root => lowerRoot}

/** The Gopher document-quality rule battery (Rae et al. 2021, §A1.1 —
  * the composite filter nearly every later corpus pipeline inherits:
  * MassiveText, RefinedWeb, FineWeb): cheap per-document counting
  * signals, each thresholded, all ANDed into one keep decision.
  *
  * Signals:
  *  - word count within [minWords, maxWords];
  *  - mean word length within [minMeanWordLen, maxMeanWordLen];
  *  - symbol-to-word ratio ('#' and '…'-as-"...") at most
  *    maxSymbolWordRatio;
  *  - fraction of words with at least one alphabetic character at
  *    least minAlphaWordFrac;
  *  - at least minStopwords of the 8 canonical stop words present
  *    (the "is this actually prose" test).
  *
  * EXACTNESS: every threshold is evaluated with integer
  * cross-multiplication (`charSum >= 3 * nWords`, `alphaWords * 5 >=
  * nWords * 4`), never a float ratio — so the keep decision is
  * bit-identical on any engine and the whole battery is
  * oracle-checkable. The thresholds are rational knobs expressed as
  * (numerator, denominator) pairs for that reason.
  *
  * Scale shape: one row-local projection over the scan — split,
  * count, compare; no shuffle, no state, no join. The same expressions
  * drive a Structured Streaming filter unchanged.
  */
object GopherRules {

  /** Gopher's stop-word presence set. */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Thresholds as exact rationals: `maxSymbolWordRatio = (1, 10)`
    * means symbols * 10 <= words * 1.
    */
  final case class Thresholds(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Int = 3,
      maxMeanWordLen: Int = 10,
      maxSymbolWordRatio: (Int, Int) = (1, 10),
      minAlphaWordFrac: (Int, Int) = (4, 5),
      minStopwords: Int = 2)

  /** All quality columns for a text column. Keys:
    * n_words, char_sum, mean_word_len (double, null for empty docs),
    * stop_hits, alpha_words, symbol_hits, ok_words, ok_mean_len,
    * ok_symbol, ok_alpha, ok_stop, keep.
    */
  def signals(text: Column, t: Thresholds = Thresholds()): Map[String, Column] = {
    val ws = filter(split(trim(text), "\\s+"), w => w =!= "")
    val nWords = coalesce(size(ws).cast("long"), lit(0L))
    val charSum = coalesce(
      aggregate(ws, lit(0L), (acc, w) => acc + length(w).cast("long")), lit(0L))
    val lowered = transform(ws, w => lowerRoot(w))
    val stopHits = Stopwords.map(sw =>
      when(array_contains(lowered, sw), 1L).otherwise(0L)).reduce(_ + _)
    val alphaWords = coalesce(
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("long"), lit(0L))
    val hashCnt = coalesce(
      length(text) - length(translate(text, "#", "")), lit(0)).cast("long")
    val ellipsisCnt = coalesce(
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3, lit(0))
      .cast("long")
    val symbolHits = hashCnt + ellipsisCnt
    val okWords = nWords >= t.minWords && nWords <= t.maxWords
    // mean word length in [lo, hi] without a division: integer
    // cross-multiplication (empty docs fail okWords anyway)
    val okMeanLen = nWords > 0 &&
      charSum >= lit(t.minMeanWordLen.toLong) * nWords &&
      charSum <= lit(t.maxMeanWordLen.toLong) * nWords
    val okSymbol = symbolHits * t.maxSymbolWordRatio._2 <=
      nWords * t.maxSymbolWordRatio._1
    val okAlpha = nWords > 0 &&
      alphaWords * t.minAlphaWordFrac._2 >= nWords * t.minAlphaWordFrac._1
    val okStop = stopHits >= t.minStopwords
    Map(
      "n_words" -> nWords,
      "char_sum" -> charSum,
      "mean_word_len" -> when(nWords > 0,
        round(charSum.cast("double") / nWords.cast("double"), 4)),
      "stop_hits" -> stopHits,
      "alpha_words" -> alphaWords,
      "symbol_hits" -> symbolHits,
      "ok_words" -> okWords,
      "ok_mean_len" -> okMeanLen,
      "ok_symbol" -> okSymbol,
      "ok_alpha" -> okAlpha,
      "ok_stop" -> okStop,
      "keep" -> (okWords && okMeanLen && okSymbol && okAlpha && okStop))
  }

  /** Per-document audit table: id + every signal + keep. */
  def audit(df: DataFrame, idCol: String, textCol: String,
      t: Thresholds = Thresholds()): DataFrame = {
    val s = signals(col(textCol), t)
    val order = Seq("n_words", "char_sum", "mean_word_len", "stop_hits",
      "alpha_words", "symbol_hits", "ok_words", "ok_mean_len", "ok_symbol",
      "ok_alpha", "ok_stop", "keep")
    df.select(col(idCol) +: order.map(k => s(k).as(k)): _*)
  }

  /** The filter composition: rows whose text passes every rule. */
  def filterQuality(df: DataFrame, textCol: String,
      t: Thresholds = Thresholds()): DataFrame =
    df.filter(signals(col(textCol), t)("keep"))
}
