package graft.ops

import org.apache.spark.sql.DataFrame
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
    * The vocab joins as a BROADCAST map (it is vocabSize rows by
    * construction), so encoding is a row-local projection: explode →
    * broadcast lookup → re-assemble in token order. Bodies shuffle
    * once, keyed by document, to reassemble; at 100 TB the alternative
    * (a driver-side dictionary UDF) would be the same shuffle-free
    * plan but loses codegen — the join form keeps Catalyst in charge.
    * Output: (idCol, token_ids array<bigint>, n_tokens, n_unk).
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, unkId: Long = 0L): DataFrame = {
    val toks = df
      .select(col(idCol),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("__pos", "token")))
      .filter(col("token") =!= "")
    val encoded = toks
      .join(broadcast(vocab.select(col("token"), col("token_id"))), Seq("token"), "left")
      .withColumn("token_id", coalesce(col("token_id"), lit(unkId)))
      .groupBy(col(idCol))
      .agg(
        transform(array_sort(collect_list(struct(col("__pos"), col("token_id")))),
          s => s.getField("token_id")).as("token_ids"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("token_id") === unkId, 1L).otherwise(0L)).as("n_unk"))
    // EVERY input document gets an output row: the exploded groupBy
    // produces nothing for empty/whitespace/null text, which would
    // silently lose those documents from downstream packing/accounting
    // — they carry ([], 0, 0) instead.
    df.select(col(idCol)).join(encoded, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("token_ids"), array().cast("array<bigint>")).as("token_ids"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_unk"), lit(0L)).as("n_unk"))
  }

  /** Per-document OOV audit against a built vocabulary: token count,
    * in-vocab count, and OOV rate — the "how much of my corpus does
    * this vocab cover" QA step. `vocab` is broadcast (it is vocabSize
    * rows by construction); the join never shuffles the corpus.
    */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val toks = df
      .select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val stats = toks
      .join(broadcast(vocab.select(col("token"), lit(1).as("__in_vocab"))),
        Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__in_vocab"), lit(0))).as("n_in_vocab"))
      .withColumn("oov_rate",
        round((col("n_tokens") - col("n_in_vocab")).cast("double") / col("n_tokens"), 4))
    // Token-less documents keep a row (n_tokens 0, oov_rate null) —
    // see [[encode]]: coverage accounting must not lose documents.
    df.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_in_vocab"), lit(0L)).as("n_in_vocab"),
        col("oov_rate"))
  }
}
