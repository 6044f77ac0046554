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
    *
    * INCREMENTAL pair counting (the standard BPE training shape): the
    * pair-count map and a pair→words index are maintained across
    * iterations, and each merge touches only the words that CONTAIN
    * the merged pair. The naive recount-everything loop is
    * O(numMerges × total-symbols) plus a full sort per iteration —
    * at tokenizer-realistic sizes (32k merges × 1M words) that is
    * days of driver CPU for what this does in minutes. Selection is
    * identical: max count, ties to the lexicographically least pair.
    */
  def learnMerges(words: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    import scala.collection.mutable
    val tbl = mutable.ArrayBuffer.empty[(List[String], Long)]
    words.filter(_._1.nonEmpty).foreach { case (w, c) => tbl += (toSymbols(w) -> c) }
    val counts = mutable.Map.empty[(String, String), Long]
    val where = mutable.Map.empty[(String, String), mutable.Set[Int]]
    tbl.indices.foreach { i =>
      val (syms, c) = tbl(i)
      syms.lazyZip(syms.drop(1)).foreach { (a, b) =>
        val k = (a, b)
        counts(k) = counts.getOrElse(k, 0L) + c
        where.getOrElseUpdate(k, mutable.Set.empty) += i
      }
    }
    val merges = Seq.newBuilder[(String, String)]
    var learned = 0
    var done = false
    while (learned < numMerges && !done) {
      // O(distinct live pairs) scan — the recount was the expensive part
      var bestK: (String, String) = null
      var bestC = 1L // only pairs occurring >= 2 qualify
      counts.foreach { case (k, c) =>
        if (c > bestC || (c == bestC && bestK != null &&
            (k._1 < bestK._1 || (k._1 == bestK._1 && k._2 < bestK._2)))) {
          bestK = k; bestC = c
        }
      }
      if (bestK == null) done = true
      else {
        val (a, b) = bestK
        merges += ((a, b))
        learned += 1
        val affected = where.getOrElse(bestK, mutable.Set.empty).toArray
        affected.foreach { i =>
          val (syms, c) = tbl(i)
          if (syms.lazyZip(syms.drop(1)).exists((x, y) => x == a && y == b)) {
            syms.lazyZip(syms.drop(1)).foreach { (x, y) =>
              val k = (x, y)
              val n = counts.getOrElse(k, 0L) - c
              if (n <= 0) counts.remove(k) else counts(k) = n
              where.get(k).foreach(_ -= i)
            }
            val merged = mergePair(syms, a, b)
            tbl(i) = (merged, c)
            merged.lazyZip(merged.drop(1)).foreach { (x, y) =>
              val k = (x, y)
              counts(k) = counts.getOrElse(k, 0L) + c
              where.getOrElseUpdate(k, mutable.Set.empty) += i
            }
          } else where.get(bestK).foreach(_ -= i) // stale index entry
        }
        counts.remove(bestK)
        where.remove(bestK)
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
