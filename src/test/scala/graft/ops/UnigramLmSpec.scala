package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer semantics ([[UnigramLm]]): seeding coverage,
  * hand-computed Viterbi, tie rules, OOV degradation, training
  * determinism, and the distributed encode.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("seedCounts keeps every single codepoint and cuts multis to seedSize by frequency") {
    val seeds = UnigramLm.seedCounts(Seq(("ab", 2L)), maxPieceLen = 3, seedSize = 1)
    // singles ▁, a, b always survive; of the multis (▁a, ab, ▁ab — all
    // count 2) the tie goes to the lexicographically least: "ab"
    // (ASCII < U+2581)
    assert(seeds.keySet == Set(UnigramLm.Boundary, "a", "b", "ab"))
    assert(seeds("ab") == 2L)
  }

  test("viterbi: hand-computed scores, longest-last-piece tie rule, OOV floor") {
    def model(ps: (String, Long)*) = UnigramLm.Model(ps.toMap, maxPieceLen = 4)
    // ▁ + ab (-1000 + -4000) beats ▁ + a + b (-1000 - 2000 - 2000)
    val m1 = model("▁" -> -1000L, "a" -> -2000L, "b" -> -2000L, "ab" -> -4000L)
    assert(UnigramLm.viterbi("▁ab", m1) == List("▁", "ab"))
    // with ab at -4500 the split wins
    val m2 = model("▁" -> -1000L, "a" -> -2000L, "b" -> -2000L, "ab" -> -4500L)
    assert(UnigramLm.viterbi("▁ab", m2) == List("▁", "a", "b"))
    // exact tie (-5000 both ways): the longer LAST piece wins
    val m3 = model("▁" -> -1000L, "a" -> -2000L, "b" -> -2000L, "ab" -> -4000L)
    assert(UnigramLm.viterbi("▁ab", m3).last == "ab")
    // unknown codepoint degrades to an OOV single-char piece
    val m4 = model("▁" -> -1000L, "a" -> -2000L)
    assert(UnigramLm.viterbi("▁az", m4) == List("▁", "a", "z"))
    assert(UnigramLm.viterbi("", m4) == Nil)
  }

  test("train: coverage, budget, round-trip, and determinism on the classic corpus") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = UnigramLm.train(words, vocabSize = 16, maxPieceLen = 4, seedSize = 64)
    // every training codepoint is a piece (coverage guarantee)
    val chars = words.flatMap(_._1).map(_.toString).toSet + UnigramLm.Boundary
    assert(chars.subsetOf(m.pieces.keySet))
    // the budget holds (it can only be exceeded by the single-char floor)
    assert(m.pieces.size <= 16)
    // at least one learned multi-codepoint piece survived
    assert(m.pieces.keys.exists(p => p.codePointCount(0, p.length) > 1))
    // segmentation concatenates back to the word (lossless round-trip)
    words.foreach { case (w, _) =>
      val seg = UnigramLm.viterbi(UnigramLm.Boundary + w, m)
      assert(seg.mkString == UnigramLm.Boundary + w, s"round-trip of $w: $seg")
    }
    // bit-identical retraining
    val m2 = UnigramLm.train(words, vocabSize = 16, maxPieceLen = 4, seedSize = 64)
    assert(m.pieces == m2.pieces)
  }

  test("train refuses empty tables and degenerate parameters loudly") {
    assertThrows[IllegalArgumentException](UnigramLm.train(Nil, 10))
    assertThrows[IllegalArgumentException](
      UnigramLm.train(Seq(("a", 1L)), vocabSize = 0))
    assertThrows[IllegalArgumentException](
      UnigramLm.train(Seq(("a", 1L)), vocabSize = 5, pruneFraction = 1.0))
    // a hand-built model with maxPieceLen <= 0 would skip the whole DP
    // and emit the word as one unscored pseudo-piece — must fail loudly
    assertThrows[IllegalArgumentException](
      UnigramLm.Model(Map("a" -> -1000L), maxPieceLen = 0))
  }

  test("encode: distributed segmentation equals the driver Viterbi; null text → empty") {
    val words = Seq(("table", 4L), ("tab", 2L), ("the", 7L))
    val m = UnigramLm.train(words, vocabSize = 12, maxPieceLen = 4, seedSize = 32)
    val docs = Seq((1L, "the table"), (2L, "tab the"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = UnigramLm.encode(docs, "doc_id", "text", m)
      .select($"doc_id", $"uni_tokens", $"n_uni")
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getLong(2))))
      .toMap
    val expect1 = UnigramLm.viterbi("▁the", m) ++ UnigramLm.viterbi("▁table", m)
    assert(got.map { case (k, (toks, _)) => k -> toks } ==
      Map(1L -> expect1,
        2L -> (UnigramLm.viterbi("▁tab", m) ++ UnigramLm.viterbi("▁the", m)),
        3L -> Seq.empty[String]))
    assert(got(1L)._2 == expect1.size.toLong)
  }
}
