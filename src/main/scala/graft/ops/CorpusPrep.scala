package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions.{lower_root => lowerRoot}

/** End-to-end training-corpus preparation: the composed pipeline a
  * pretraining data team actually runs (the CCNet/Dolma/RefinedWeb
  * shape) — language filter → quality filter → exact dedup → PII
  * redaction — as ONE declarative plan.
  *
  * Stage order is the scale design:
  *  1. language + quality filters are codegen'd, scan-local, and run
  *     FIRST — the bulk of a web corpus dies here without ever being
  *     shuffled;
  *  2. exact dedup is the pipeline's only shuffle, and it shuffles the
  *     already-filtered survivors hashed by a 16-byte fingerprint (a
  *     window keep-min-id per fingerprint — bodies ride the exchange
  *     once);
  *  3. redaction rewrites bodies LAST, so the regex scan pays only for
  *     rows that survive everything else.
  *
  * Every stage is deterministic and SQL-expressible, so the whole
  * composition — not just each piece — is oracle-checkable.
  */
object CorpusPrep {

  // Empty tokens FILTERED — see Dedup.tokens: the naive split keeps
  // leading/trailing empties for non-space whitespace.
  private def toks(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  val enMarkers: Seq[String] = Seq("the", "a", "of", "and")
  val deMarkers: Seq[String] = Seq("der", "und", "die", "das")
  val frMarkers: Seq[String] = Seq("le", "la", "et", "les")

  /** Stopword-marker language guess ('en'/'de'/'fr'/'und') —
    * deterministic argmax with the same tie-break as the text_langid
    * harness query.
    */
  def langGuess(text: Column): Column = {
    val t = toks(text)
    def score(m: Seq[String]) = size(filter(t, x => x.isin(m: _*)))
    val sEn = score(enMarkers)
    val sDe = score(deMarkers)
    val sFr = score(frMarkers)
    when(sEn >= sDe && sEn >= sFr && sEn > 0, "en")
      .when(sDe >= sFr && sDe > 0, "de")
      .when(sFr > 0, "fr")
      .otherwise("und")
  }

  /** Whitespace-normalized lowercase digest — the exact-dedup key. */
  def normFingerprint(text: Column): Column =
    md5(regexp_replace(lowerRoot(trim(text)), "\\s+", " "))

  /** The composed pipeline. Returns the surviving `docs` rows with
    * `textCol` replaced by its redacted form (all other columns
    * untouched). Duplicates keep the smallest `idCol`.
    */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
      keepLang: String = "en",
      minTokens: Int = 1, maxTokens: Int = Int.MaxValue,
      maxStopwordRatio: Double = 1.0,
      rules: Seq[Redact.Rule] = Redact.defaultRules): DataFrame = {
    val reserved = Seq("__fp", "__rn")
    require(!docs.columns.exists(reserved.contains),
      s"docs reserves column name(s) ${reserved.mkString(", ")}")
    val t = toks(col(textCol))
    val nTok = size(t)
    val stopRatio = when(nTok > 0,
      size(filter(t, x => x.isin(enMarkers: _*))).cast("double") / nTok)
      .otherwise(lit(0.0))
    val filtered = docs
      .filter(langGuess(col(textCol)) === keepLang)
      .filter(nTok >= minTokens && nTok <= maxTokens)
      .filter(stopRatio <= maxStopwordRatio)
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol).asc)
    filtered
      .withColumn("__fp", normFingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
      .withColumn(textCol, Redact.redact(col(textCol), rules))
  }
}
