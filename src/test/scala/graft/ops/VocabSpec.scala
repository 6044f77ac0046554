package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "b b b a a c"),
    (2L, "a  b"), // multi-space split
    (3L, ""), //  empty doc contributes nothing
    (4L, "d c b")).toDF("id", "text")

  test("ranks by count desc then token asc with dense 1-based ids") {
    val v = Vocab.build(docs, "text", vocabSize = 10)
      .as[(String, Long, Long)].collect().toSeq
    // counts: b=5, a=3, c=2, d=1
    assert(v == Seq(("b", 5L, 1L), ("a", 3L, 2L), ("c", 2L, 3L), ("d", 1L, 4L)))
  }

  test("vocabSize cuts at the deterministic boundary") {
    val v = Vocab.build(docs, "text", vocabSize = 2)
      .select("token").as[String].collect().toSeq
    assert(v.sorted == Seq("a", "b"))
  }

  test("minCount drops the tail before the cut") {
    val v = Vocab.build(docs, "text", vocabSize = 10, minCount = 2L)
      .select("token").as[String].collect().toSeq
    assert(v.sorted == Seq("a", "b", "c"))
  }

  test("equal counts break ties by token order at the boundary") {
    val tied = Seq((1L, "x y")).toDF("id", "text")
    val v = Vocab.build(tied, "text", vocabSize = 1)
      .as[(String, Long, Long)].collect().toSeq
    assert(v == Seq(("x", 1L, 1L)))
  }

  test("encode maps tokens to rank ids in document order, OOV to unkId") {
    val vocab = Vocab.build(docs, "text", vocabSize = 3) // b=1, a=2, c=3
    val out = Vocab.encode(Seq((7L, "a b  z c a")).toDF("id", "text"),
      "id", "text", vocab)
      .as[(Long, Seq[Long], Long, Long)].collect().toSeq
    assert(out == Seq((7L, Seq(2L, 1L, 0L, 3L, 2L), 5L, 1L)))
  }

  test("encode of an all-OOV document counts every token as unk") {
    val vocab = Vocab.build(docs, "text", vocabSize = 3)
    val out = Vocab.encode(Seq((1L, "zz yy")).toDF("id", "text"), "id", "text", vocab)
      .as[(Long, Seq[Long], Long, Long)].collect().toSeq
    assert(out == Seq((1L, Seq(0L, 0L), 2L, 2L)))
  }

  test("oovStats reports per-document coverage against the vocab") {
    val vocab = Vocab.build(docs, "text", vocabSize = 2) // {b, a}
    val stats = Vocab.oovStats(docs, "id", "text", vocab)
      .orderBy("id").as[(Long, Long, Long, Option[Double])].collect().toSeq
    // doc1: 6 tokens, 5 in {a,b}; doc2: 2/2; doc3: token-less but KEPT
    // (coverage accounting must not lose documents — rate undefined);
    // doc4: 3 tokens, 1 in vocab
    assert(stats == Seq(
      (1L, 6L, 5L, Some(0.1667)), (2L, 2L, 2L, Some(0.0)),
      (3L, 0L, 0L, None), (4L, 3L, 1L, Some(0.6667))))
  }
}
