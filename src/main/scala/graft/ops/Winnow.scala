package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
  * — the MOSS algorithm): from the stream of token n-gram hashes,
  * every window of `w` consecutive grams contributes its MINIMUM hash.
  * The selected set is position-robust — any shared run of at least
  * n + w - 1 tokens between two documents is guaranteed to contribute
  * at least one common fingerprint, no matter how the surrounding text
  * shifts it — which is what stride sampling can't promise. Density is
  * ~2/(w+1) of all grams, so the fingerprint table is a tunable
  * fraction of the corpus.
  *
  * Selection is BY VALUE (a window's min hash), so the output is the
  * distinct (doc, fingerprint) set and no tie rule is needed: equal
  * hashes are the same gram text (full 128-bit md5), and the set
  * collapses them. Documents with fewer than `w` grams contribute
  * their single global minimum (never zero fingerprints for a tokenized
  * document); documents shorter than `n` tokens have no grams and none.
  *
  * Everything is row-local min algebra over the positioned md5 gram
  * array — exact, engine-portable, oracle-checkable.
  *
  * Scale shape: NO shuffle at all — tokenize, gram digests and window
  * minima are one native pass in the scan task. Downstream, fingerprints feed the same machinery
  * as shingle signatures: groupBy fingerprint for cross-doc candidate
  * pairs, or set-similarity join ([[Dedup.minhashLshPairs]] shape).
  */
object Winnow {

  /** Distinct (id, fingerprint) rows; `fingerprint` is the md5 hex of
    * the selected n-gram. `n` = gram length in tokens, `w` = winnowing
    * window in grams.
    *
    * The whole selection is ROW-LOCAL now (native tokenize → positioned
    * md5 gram array → [[graft.functions.WinnowFingerprints]] in the
    * scan task): the previous form paid a doc-keyed token exchange +
    * sort for the positioned pass, four window functions over it, and
    * an (id, fingerprint) distinct exchange — all of which collapse
    * into one per-row pass with byte-identical output (complete
    * windows select their min; documents with fewer than w grams fall
    * back to their global min; distinctness is per document, which IS
    * per row under the one-row-per-document corpus contract).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, w: Int = 4): DataFrame = {
    require(n >= 2, s"gram length must be >= 2, got $n")
    require(w >= 1, s"winnow window must be >= 1, got $w")
    import graft.functions.GraftExtensions.{word_ngram_md5, winnow_fingerprints, ws_tokens}
    df.select(col(idCol),
        explode(winnow_fingerprints(
          word_ngram_md5(ws_tokens(col(textCol)), n), w)).as("fingerprint"))
  }

  /** Cross-document candidate pairs: documents sharing at least
    * `minShared` fingerprints (id_a < id_b). The fingerprint-keyed
    * groupBy is the only corpus-wide shuffle; buckets larger than
    * `maxBucket` docs are dropped, not paired (the standard quadratic
    * guard — a fingerprint shared by half the corpus is boilerplate,
    * which is [[SpanDedup]]'s job to remove, not a similarity signal).
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, w: Int = 4, minShared: Int = 2,
      maxBucket: Int = 1024): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    // maxBucket <= 0 would classify EVERY bucket as hot and silently
    // return an empty result — indistinguishable from "no similar
    // documents" (the Dedup.ngramJaccardPrefixPairsManaged guard).
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val fps = fingerprints(df, idCol, textCol, n, w)
    // Bucket sizes as a map-side-combined AGGREGATE and the cap as a
    // broadcast anti-join — the same shape as the prefix-jaccard cap
    // (Dedup.ngramJaccardPrefixPairsManaged): a per-fingerprint window
    // would funnel a corpus-wide boilerplate fingerprint into ONE task
    // before the cap could drop it. The over-cap list is broadcast-
    // sized by pigeonhole (≤ |fps| / maxBucket entries).
    val hot = fps.groupBy(col("fingerprint")).agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") > maxBucket).select(col("fingerprint"))
    val capped = fps.join(broadcast(hot), Seq("fingerprint"), "left_anti")
    val a = capped.select(col("fingerprint"), col(idCol).as("id_a"))
    val b = capped.select(col("fingerprint"), col(idCol).as("id_b"))
    a.join(b, Seq("fingerprint"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
