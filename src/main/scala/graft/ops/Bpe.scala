package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application — the step
  * between [[Vocab]]'s whitespace vocabulary and real subword
  * tokenization.
  *
  * Scale architecture (the classic one): BPE training NEVER iterates
  * over the corpus. The corpus is scanned once into a word-frequency
  * table cut to `maxWords` (one explode + map-side-combined aggregate,
  * the same plan as [[Vocab.build]]); the merge loop then runs on that
  * bounded table DRIVER-SIDE — it is a model artifact like IVF
  * centroids or histogram offsets, sized by a parameter, not by the
  * data. Encoding is one distributed pass: the learned merge ranks
  * broadcast into a per-row greedy merge (a UDF by necessity — rank-
  * ordered iterative pair collapse has no Column-function form; it
  * runs on each row independently and carries ~numMerges map entries).
  *
  * Determinism: pair selection breaks count ties by (first, second)
  * symbol order, so the same corpus always learns the same merges on
  * any engine or cluster layout.
  */
object Bpe {

  /** End-of-word marker (attached to a word's last symbol, GPT-2
    * convention flipped word-final like the original BPE paper).
    */
  val EndOfWord = "</w>"

  /** The single corpus pass of training: top-`maxWords` whitespace
    * words by frequency. (word, cnt), descending — ties broken by word
    * for determinism. Delegates to [[Vocab.build]] so BPE training and
    * the rest of the text stack can never drift on tokenization rules.
    */
  def wordTable(df: DataFrame, textCol: String, maxWords: Int): DataFrame =
    Vocab.build(df, textCol, maxWords)
      .select(col("token").as("word"), col("cnt"))

  /** Greedy left-to-right collapse of one (a, b) adjacency.
    * Iterative — a degenerate megabyte-long "word" must not blow the
    * stack inside an executor.
    */
  private[ops] def mergePair(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var rest = syms
    while (rest.nonEmpty) {
      rest match {
        case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
        case x :: tail                          => out += x; rest = tail
        case Nil                                => ()
      }
    }
    out.toList
  }

  /** Initial symbols are CODE POINTS, not UTF-16 units — an astral
    * character (emoji, rare CJK) is one symbol, never a surrogate
    * pair split across two (which no merge could ever rejoin, and
    * which char-indexed SQL engines don't reproduce).
    */
  private def toSymbols(word: String): List[String] = {
    val cps = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toList
    cps.init :+ (cps.last + EndOfWord)
  }

  /** Learn up to `numMerges` merges from a driver-side word-frequency
    * table (use [[wordTable]].collect — it is `maxWords` rows by
    * construction). Stops early when no pair occurs twice.
    */
  def learnMerges(words: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    var table: Seq[(List[String], Long)] =
      words.filter(_._1.nonEmpty).map { case (w, c) => toSymbols(w) -> c }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var learned = 0
    while (learned < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      table.foreach { case (syms, c) =>
        syms.lazyZip(syms.drop(1)).foreach { (a, b) =>
          counts((a, b)) = counts.getOrElse((a, b), 0L) + c
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }
        .headOption.filter(_._2 >= 2)
      best match {
        case None => done = true
        case Some(((a, b), _)) =>
          merges += ((a, b))
          learned += 1
          table = table.map { case (syms, c) => mergePair(syms, a, b) -> c }
      }
    }
    merges.result()
  }

  /** Encode a word with rank-ordered merges (lowest rank first, the
    * standard BPE inference rule — NOT document frequency order).
    */
  private[ops] def encodeWord(word: String, ranks: Map[(String, String), Int]): List[String] = {
    if (word.isEmpty) return Nil
    var syms = toSymbols(word)
    var continue = true
    while (continue && syms.size > 1) {
      val candidates = syms.lazyZip(syms.drop(1))
        .flatMap((a, b) => ranks.get((a, b)).map(r => (r, a, b)))
      if (candidates.isEmpty) continue = false
      else {
        val (_, a, b) = candidates.minBy(_._1)
        syms = mergePair(syms, a, b)
      }
    }
    syms
  }

  /** Distributed encode: (idCol, bpe_tokens array<string>, n_bpe) per
    * document. One corpus pass; the merge ranks ride the closure
    * (numMerges entries). A UDF by necessity — see the class doc.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val enc = udf { text: String =>
      if (text == null) Seq.empty[String]
      else text.trim.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(w => encodeWord(w, ranks))
    }
    df.select(col(idCol), enc(col(textCol)).as("bpe_tokens"))
      .withColumn("n_bpe", size(col("bpe_tokens")).cast("long"))
  }
}
