package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns the hand-computed merges of the classic low/lower corpus") {
    // 5×low, 2×lower, 6×newest, 3×widest (the BPE paper's shape).
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.learnMerges(words, numMerges = 4)
    // round 1: (e,s)=9 ties (s,t</w>)=9 → (e,s) wins on symbol order;
    // round 2: (es,t</w>)=9; round 3: (l,o)=7;
    // round 4: (e,w)/(n,e)/(w,est</w>) tie at 6 → (e,w) by symbol order
    assert(merges == Seq(("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w")))
  }

  test("merge learning stops when no pair repeats") {
    val words = Seq(("ab", 1L), ("cd", 1L))
    assert(Bpe.learnMerges(words, numMerges = 10).isEmpty)
  }

  test("encode applies merges by RANK, not adjacency order, and marks word ends") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.learnMerges(words, numMerges = 4)
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encodeWord("low", ranks) == List("lo", "w</w>"))
    // (e,s) applies first by rank even though (e,w) is adjacent earlier
    assert(Bpe.encodeWord("newest", ranks) == List("n", "ew", "est</w>"))
    assert(Bpe.encodeWord("lowest", ranks) == List("lo", "w", "est</w>"))
    // unseen word falls back to characters + end marker
    assert(Bpe.encodeWord("xyz", ranks) == List("x", "y", "z</w>"))
  }

  test("round-trip: concatenated tokens minus the marker reconstruct every word") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val ranks = Bpe.learnMerges(words, 4).zipWithIndex.toMap
    Seq("low", "lower", "lowest", "widest", "семья").foreach { w =>
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString("").stripSuffix(Bpe.EndOfWord) == w, w)
    }
  }

  test("end-to-end over DataFrames: word table, training, distributed encode") {
    val docs = Seq(
      (1L, "low low low low low newest newest newest"),
      (2L, "lower lower newest newest newest widest"),
      (3L, "widest widest")).toDF("doc_id", "text")
    val wt = Bpe.wordTable(docs, "text", maxWords = 100)
      .as[(String, Long)].collect().toSeq
    assert(wt.toMap == Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L))
    val merges = Bpe.learnMerges(wt, 4)
    val out = Bpe.encode(docs, "doc_id", "text", merges)
      .select("doc_id", "n_bpe").as[(Long, Long)].collect().toMap
    // doc 1: 5×low(2 toks) + 3×newest(3 toks) = 19
    assert(out(1L) == 19L)
    // determinism across runs
    val out2 = Bpe.encode(docs, "doc_id", "text", merges)
      .select("doc_id", "n_bpe").as[(Long, Long)].collect().toMap
    assert(out == out2)
  }

  test("null and empty texts encode to zero tokens") {
    val docs = Seq((1L, Some("")), (2L, None: Option[String]), (3L, Some("ab ab")))
      .toDF("doc_id", "text")
    val out = Bpe.encode(docs, "doc_id", "text",
      merges = Seq(("a", "b</w>")))
      .select("doc_id", "n_bpe").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 2L))
  }
}
