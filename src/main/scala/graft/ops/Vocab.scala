package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary construction — the tokenizer-training precursor
  * (count every token across the corpus, keep the `vocabSize` most
  * frequent, assign dense ids by rank).
  *
  * Scale design: the only corpus-sized stage is the token count — one
  * explode + hash aggregate with map-side partial combine, so the
  * shuffle carries (token, partial_count) pairs, not token
  * occurrences. The top-V cut is `orderBy(...).limit(V)` —
  * TakeOrderedAndProject keeps a bounded V-row heap per partition and
  * merges heaps, never a global sort of the full token table. Id
  * assignment windows over the V surviving rows only (single bounded
  * task by construction — V is the vocab size, not the corpus).
  *
  * Ordering is fully deterministic: rank by (count desc, token asc),
  * so equal-frequency tokens at the V boundary resolve identically on
  * every run and engine.
  */
object Vocab {

  /** (token, cnt, token_id) for the `vocabSize` most frequent
    * whitespace tokens with count >= `minCount`; ids are 1-based in
    * rank order.
    */
  def build(df: DataFrame, textCol: String, vocabSize: Int,
      minCount: Long = 1L): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val top = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(vocabSize)
    top.withColumn("token_id",
      row_number().over(Window.orderBy(col("cnt").desc, col("token").asc))
        .cast("long"))
  }

  /** Tokenize each document into vocabulary ids — the encoding step
    * between vocabulary construction and sequence packing. Unknown
    * tokens map to `unkId` (0 by default; real ids are 1-based).
    *
    * ROW-LOCAL: the vocabulary is a driver artifact (vocabSize rows BY
    * CONSTRUCTION — the same boundedness the previous broadcast join
    * relied on) baked into one native expression as an O(1) hash map
    * ([[graft.functions.VocabEncode]]), so the explode → broadcast
    * lookup → collect_list/array_sort reassembly — and its doc-keyed
    * exchange of every (pos, token_id) pair plus a per-document sort —
    * never happens; documents are encoded in the scan task. Eagerly
    * collects `vocab` (pass a materialized/cheap vocab frame — the
    * artifact contract of [[Dedup.incrementalNearDupMatches]]).
    * Output: (idCol, token_ids array<bigint>, n_tokens, n_unk); every
    * input document keeps a row (empty/whitespace/null text carries
    * ([], 0, 0) — coverage accounting must not lose documents).
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, unkId: Long = 0L): DataFrame = {
    val enc = encodedStruct(df, textCol, vocab, unkId)
    df.select(col(idCol), enc.as("__e"))
      .select(col(idCol),
        coalesce(col("__e.token_ids"), array().cast("array<bigint>")).as("token_ids"),
        coalesce(col("__e.n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("__e.n_unk"), lit(0L)).as("n_unk"))
  }

  /** Per-document OOV audit against a built vocabulary: token count,
    * in-vocab count, and OOV rate — the "how much of my corpus does
    * this vocab cover" QA step. Same row-local driver-artifact shape
    * as [[encode]] (one expression, no join, no doc-keyed exchange);
    * token-less documents keep a row (n_tokens 0, oov_rate null).
    */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val enc = encodedStruct(df, textCol, vocab, unkId = 0L)
    df.select(col(idCol), enc.as("__e"))
      .select(col(idCol),
        coalesce(col("__e.n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("__e.n_in_vocab"), lit(0L)).as("n_in_vocab"))
      .withColumn("oov_rate",
        when(col("n_tokens") > 0,
          round((col("n_tokens") - col("n_in_vocab")).cast("double")
            / col("n_tokens"), 4)))
  }

  /** The shared row-local encode column: null struct for null text
    * (callers coalesce), ws_tokens tokenization (byte-equal to the
    * trim+split+filter spelling).
    */
  private def encodedStruct(df: DataFrame, textCol: String,
      vocab: DataFrame, unkId: Long): Column = {
    val entries = vocab.select(col("token"), col("token_id").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    graft.functions.GraftExtensions.vocab_encode(
      graft.functions.GraftExtensions.ws_tokens(col(textCol)), entries, unkId)
  }
}
