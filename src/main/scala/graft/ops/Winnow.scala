package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Everything is min/count window algebra over [[SpanDedup.positionedGrams]]
  * — exact, engine-portable, oracle-checkable.
  *
  * Scale shape: one doc-keyed shuffle (the positioned pass's window),
  * then doc-local window min + distinct — map-side combinable, no
  * corpus-wide key. Downstream, fingerprints feed the same machinery
  * as shingle signatures: groupBy fingerprint for cross-doc candidate
  * pairs, or set-similarity join ([[Dedup.minhashLshPairs]] shape).
  */
object Winnow {

  /** Distinct (id, fingerprint) rows; `fingerprint` is the md5 hex of
    * the selected n-gram. `n` = gram length in tokens, `w` = winnowing
    * window in grams.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, w: Int = 4): DataFrame = {
    require(w >= 1, s"winnow window must be >= 1, got $w")
    val grams = SpanDedup.positionedGrams(df, idCol, textCol, n)
      .filter(col("__gh").isNotNull)
    val ahead = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val byId = Window.partitionBy(col(idCol))
    // complete windows select their min; short documents (< w grams
    // in total ⇒ no complete window anywhere) fall back to the global
    // min, which is exactly the widest prefix window's min. The
    // fallback rides the SAME window pass (whole-doc count + min share
    // the id partitioning — no sort of their own): a short doc emits
    // its global min on every gram row and the distinct collapses
    // them, which beats a second positioned-gram evaluation + union
    // (the previous formulation ran the tokenize+window pipeline
    // twice).
    grams
      .withColumn("__wmin", min(col("__gh")).over(ahead))
      .withColumn("__wcnt", count(lit(1)).over(ahead))
      .withColumn("__tot", count(lit(1)).over(byId))
      .withColumn("__gmin", min(col("__gh")).over(byId))
      .filter(col("__wcnt") === w || col("__tot") < w)
      .select(col(idCol),
        when(col("__tot") < w, col("__gmin"))
          .otherwise(col("__wmin")).as("fingerprint"))
      .distinct()
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
