package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece unigram model,
  * Kudo 2018) — the EM-trained alternative to [[Bpe]]'s greedy merges:
  * a piece inventory with log-probabilities, segmentation = the
  * Viterbi-best split of each word under those probabilities.
  *
  * Scale architecture — identical to [[Bpe]] by design: training NEVER
  * iterates over the corpus. One corpus pass builds the bounded
  * word-frequency table ([[Bpe.wordTable]], shared so the two
  * tokenizers can never drift on word splitting); seeding, Viterbi-EM
  * and pruning run DRIVER-SIDE on that `maxWords`-row artifact.
  * Encoding is one distributed pass with the piece table riding the
  * closure (≤ vocabSize entries) — a UDF by necessity, like BPE's
  * rank-ordered collapse: per-word Viterbi has no Column-function form.
  *
  * Word boundaries use the SentencePiece convention: every word is
  * prefixed with `▁` (U+2581) before segmentation, so the decoded
  * piece stream is unambiguous (`concat(pieces)` = `▁word▁word…`).
  *
  * Determinism (the engine-stability stance of the text stack):
  * piece scores are INTEGER MILLI-NATS (`round(StrictMath.log(p)·1000)`
  * — StrictMath, so no platform-intrinsic drift), Viterbi sums longs,
  * and every selection (seed cut, EM iteration order, prune cut, DP
  * tie) breaks ties by piece string. The same word table always
  * yields the same model and the same segmentation, on any JVM or
  * cluster layout.
  */
object UnigramLm {

  /** SentencePiece word-boundary marker (U+2581 LOWER ONE EIGHTH BLOCK). */
  val Boundary = "▁"

  /** OOV score for a single codepoint outside the inventory
    * (encode-time only — training chars are always covered): worse
    * than any real piece so known segmentations always win, but
    * finite so unknown characters degrade to char pieces instead of
    * failing the document.
    */
  val OovMilliNats: Long = -100000L

  /** The learned model: piece → integer milli-nat log-probability. */
  final case class Model(pieces: Map[String, Long], maxPieceLen: Int) {
    require(pieces.nonEmpty, "unigram model has no pieces")
    // maxPieceLen <= 0 would skip the whole DP and "reconstruct" the
    // word as one unscored pseudo-piece — fail loudly instead
    require(maxPieceLen >= 1,
      s"unigram model maxPieceLen must be >= 1, got $maxPieceLen")
  }

  private def toCps(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Candidate seed inventory from the word table: every ≤`maxPieceLen`
    * codepoint substring of `▁word`, weighted by word frequency. ALL
    * single codepoints survive (coverage guarantee); multi-codepoint
    * candidates are cut to the `seedSize` most frequent (ties to the
    * lexicographically least piece).
    */
  private[ops] def seedCounts(words: Seq[(String, Long)], maxPieceLen: Int,
      seedSize: Int): Map[String, Long] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, c) =>
      if (w != null && w.nonEmpty) {
        val cps = toCps(Boundary + w)
        for (i <- cps.indices; len <- 1 to math.min(maxPieceLen, cps.length - i)) {
          val piece = cps.slice(i, i + len).mkString
          counts(piece) = counts.getOrElse(piece, 0L) + c
        }
      }
    }
    val (singles, multis) = counts.toSeq.partition(
      p => p._1.codePointCount(0, p._1.length) == 1)
    val kept = multis.sortBy { case (p, c) => (-c, p) }.take(seedSize)
    (singles ++ kept).toMap
  }

  /** Viterbi-best segmentation of one word (boundary NOT added here —
    * callers prepend). DP over codepoint positions with long milli-nat
    * scores; ties prefer the segmentation whose LAST piece is longest,
    * applied position-by-position — deterministic without scoring
    * every path. Codepoints outside the
    * model fall back to [[OovMilliNats]] single-char pieces.
    */
  private[ops] def viterbi(word: String, model: Model): List[String] = {
    val cps = toCps(word)
    val n = cps.length
    if (n == 0) return Nil
    val best = Array.fill(n + 1)(Long.MinValue)
    val back = Array.fill(n + 1)(-1) // start index of the winning last piece
    best(0) = 0L
    for (i <- 1 to n) {
      var j = math.max(0, i - model.maxPieceLen)
      while (j < i) {
        val piece = cps.slice(j, i).mkString
        val sc = model.pieces.get(piece)
          .orElse(if (i - j == 1) Some(OovMilliNats) else None)
        sc.foreach { s =>
          if (best(j) != Long.MinValue) {
            val cand = best(j) + s
            // strict > with j ascending = longest last piece wins ties
            if (cand > best(i) || (cand == best(i) && back(i) > j)) {
              best(i) = cand; back(i) = j
            }
          }
        }
        j += 1
      }
    }
    var out = List.empty[String]
    var i = n
    while (i > 0) {
      val j = back(i)
      out = cps.slice(j, i).mkString :: out
      i = j
    }
    out
  }

  /** Train a unigram model from a driver-side word table (use
    * [[Bpe.wordTable]].collect — `maxWords` rows by construction).
    *
    * Viterbi-EM with pruning rounds, the standard recipe: seed →
    * [re-estimate piece counts from the Viterbi segmentation of every
    * word (weighted by frequency) → renormalize → drop the weakest
    * `pruneFraction` of multi-codepoint pieces] until the inventory
    * fits `vocabSize`, then a final EM pass scores the survivors.
    * Single codepoints are never pruned (coverage); a multi piece
    * whose expected count hits zero dies immediately.
    */
  def train(words: Seq[(String, Long)], vocabSize: Int,
      maxPieceLen: Int = 8, seedSize: Int = 4096,
      pruneFraction: Double = 0.25): Model = {
    require(vocabSize > 0, "vocabSize must be positive")
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    require(pruneFraction > 0 && pruneFraction < 1,
      s"pruneFraction must be in (0,1), got $pruneFraction")
    val table = words.filter(w => w._1 != null && w._1.nonEmpty)
      .map { case (w, c) => (Boundary + w, c) }
    require(table.nonEmpty, "unigram training needs a non-empty word table")

    def toModel(counts: Map[String, Long]): Model = {
      val total = counts.values.sum.max(1L)
      val logp = counts.map { case (p, c) =>
        p -> math.round(StrictMath.log(c.max(1L).toDouble / total) * 1000)
      }
      Model(logp, maxPieceLen)
    }

    def emCounts(model: Model): Map[String, Long] = {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      table.foreach { case (w, c) =>
        viterbi(w, model).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + c)
      }
      counts.toMap
    }

    var counts = seedCounts(words, maxPieceLen, seedSize)
    var model = toModel(counts)
    var rounds = 0
    while (counts.size > vocabSize && rounds < 100) {
      val em = emCounts(model)
      // survivors keep their EM count; unused SINGLE cps stay at 1
      // (coverage floor), unused multis die
      val (singles, multis) = counts.keySet.toSeq.partition(
        p => p.codePointCount(0, p.length) == 1)
      val scored = multis.flatMap(p => em.get(p).map(p -> _))
        .sortBy { case (p, c) => (c, p) } // weakest first
      val overBudget = (singles.size + scored.size) - vocabSize
      // drop at most pruneFraction of the multis per round (EM
      // re-estimates between rounds — the SentencePiece recipe), and
      // never more than the actual excess
      val toDrop =
        if (overBudget <= 0 || scored.isEmpty) 0
        else math.min(scored.size, math.min(overBudget,
          math.max(1, math.ceil(scored.size * pruneFraction).toInt)))
      val kept = scored.drop(toDrop)
      counts = (singles.map(p => p -> em.getOrElse(p, 1L)) ++ kept).toMap
      model = toModel(counts)
      rounds += 1
      // vocabSize smaller than the single-codepoint alphabet cannot be
      // honored (coverage wins); stop instead of spinning
      if (toDrop == 0 && scored.isEmpty) rounds = 100
    }
    // final EM pass so scores reflect the surviving inventory
    val finalCounts = emCounts(model)
    val withFloor = counts.map { case (p, _) =>
      p -> finalCounts.getOrElse(p, if (p.codePointCount(0, p.length) == 1) 1L else 0L)
    }.filter { case (p, c) => c > 0 || p.codePointCount(0, p.length) == 1 }
    toModel(withFloor)
  }

  /** Distributed encode: `(idCol, uni_tokens array<string>, n_uni)` per
    * document — each whitespace word is boundary-prefixed and
    * Viterbi-segmented under the broadcast-by-closure model. One
    * corpus pass, row-local, streaming-safe.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val m = model
    val enc = udf { text: String =>
      if (text == null) Seq.empty[String]
      else text.trim.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(w => viterbi(Boundary + w, m))
    }
    df.select(col(idCol), enc(col(textCol)).as("uni_tokens"))
      .withColumn("n_uni", size(col("uni_tokens")).cast("long"))
  }
}
