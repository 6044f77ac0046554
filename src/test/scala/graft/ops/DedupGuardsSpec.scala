package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Review-driven guards for the dedup/tokenization core. */
class DedupGuardsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: no phantom empty tokens for leading/trailing whitespace") {
    val out = Seq("foo bar", "foo bar\n", "\tfoo  bar ", "\n", "", null)
      .toDF("t").select(Dedup.tokens(col("t")).as("tk"))
      .collect().map(r => Option(r.getSeq[String](0)).map(_.toList))
    assert(out(0) === Some(List("foo", "bar")))
    assert(out(1) === Some(List("foo", "bar")), "trailing newline must not add a token")
    assert(out(2) === Some(List("foo", "bar")))
    assert(out(3) === Some(Nil))
    assert(out(4) === Some(Nil))
    assert(out(5) === None) // null text stays null
  }

  test("exact duplicates differing only by trailing whitespace are caught by jaccard") {
    // before the tokenizer fix, "\n" added a phantom token and the
    // 2-gram Jaccard of an exact-duplicate pair was 1/2, not 1.0
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta\n"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("exact dedup never groups null-text documents together") {
    val docs = Seq((1L, null), (2L, null), (3L, "x"), (4L, "x"))
      .toDF("doc_id", "text").selectExpr("doc_id", "CAST(text AS STRING) AS text")
    val groups = Dedup.exact(docs, "doc_id", "text")
      .select("keeper_id", "n_dupes").as[(Long, Long)].collect().toSet
    assert(groups === Set((3L, 2L)), "null text must be excluded, not one bogus group")
  }

  test("two minhash calls compose in one query plan (unique metric names)") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val p1 = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 2,
      numHashes = 8, bands = 4, threshold = 0.5)
    val p2 = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3,
      numHashes = 8, bands = 4, threshold = 0.5)
    // fixed observe names previously failed analysis with duplicate
    // CollectMetrics on this union
    assert(p1.unionByName(p2).count() >= 2L)
  }

  test("Vocab encode/oov keep a row for token-less documents") {
    val docs = Seq((1L, "alpha beta"), (2L, ""), (3L, "   "),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val vocab = Vocab.build(docs, "text", vocabSize = 5)
    val enc = Vocab.encode(docs, "doc_id", "text", vocab)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(enc === Map(1L -> 2L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    val oov = Vocab.oovStats(docs, "doc_id", "text", vocab)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(oov.keySet === Set(1L, 2L, 3L, 4L))
  }

  test("packSequences rejects fractional types and negative counts") {
    val bad = Seq((1L, 2.5)).toDF("id", "n")
    val e = intercept[IllegalArgumentException] {
      Packing.packSequences(bad, "id", "n", budget = 10L, shards = 1)
    }
    assert(e.getMessage.contains("integral"))
    val neg = Seq((1L, 5L), (2L, -5000L)).toDF("id", "n")
    val e2 = intercept[Exception] {
      Packing.packSequences(neg, "id", "n", budget = 10L, shards = 1).collect()
    }
    assert(e2.getMessage.contains("negative token count") ||
      Option(e2.getCause).exists(_.getMessage.contains("negative token count")))
  }

  test("BPE incremental trainer matches the recount-from-scratch reference") {
    // a small randomized-ish corpus; reference = the old O(merges × table)
    // recount loop, re-implemented inline
    val words = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L,
      "lowest" -> 4L, "news" -> 7L, "wide" -> 1L)
    def reference(ws: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
      def toSyms(w: String): List[String] = {
        val cps = w.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toList
        cps.init :+ (cps.last + Bpe.EndOfWord)
      }
      var table = ws.map { case (w, c) => toSyms(w) -> c }
      val out = Seq.newBuilder[(String, String)]
      var done = false; var n = 0
      while (n < numMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        table.foreach { case (s, c) =>
          s.lazyZip(s.drop(1)).foreach((a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c) }
        counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption.filter(_._2 >= 2) match {
          case None => done = true
          case Some(((a, b), _)) =>
            out += ((a, b)); n += 1
            table = table.map { case (s, c) => Bpe.mergePair(s, a, b) -> c }
        }
      }
      out.result()
    }
    assert(Bpe.learnMerges(words, 25) === reference(words, 25))
  }
}
