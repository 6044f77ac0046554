package graft.ops

import graft.SparkSpec

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 matches the hand-computed Okapi formula on a tiny corpus") {
    val docs = Seq(
      (1L, "spark join spark table"),
      (2L, "join the stream"),
      (3L, "table scan only"),
      (4L, "SPARK, spark; nonsparkword!")).toDF("id", "txt")
    val out = TextRank.bm25(docs, "id", "txt", Seq("spark", "stream"))
      .as[(Long, Double)].collect().toMap

    // N=4; dl = 4,3,3,3 → avgdl = 13/4; df_spark=2 (docs 1,4), df_stream=1.
    val avgdl = 13.0 / 4
    def idf(df: Int) = math.log((4 - df + 0.5) / (df + 0.5) + 1)
    def c(df: Int, tf: Long, dl: Long) =
      idf(df) * (tf * 2.2) / (tf + (1.2 * (0.25 + 0.75 * dl / avgdl)))

    assert(out.keySet === Set(1L, 2L, 4L), "doc 3 matches nothing and is dropped")
    assert(math.abs(out(1L) - c(2, 2, 4)) < 1e-12)
    assert(math.abs(out(2L) - c(1, 1, 3)) < 1e-12)
    // doc 4: case-folded + punctuation-split → tf_spark=2; the
    // substring inside "nonsparkword" is NOT a token match
    assert(math.abs(out(4L) - c(2, 2, 3)) < 1e-12)
  }

  test("bm25: longer documents score below shorter ones at equal tf (length normalization)") {
    val docs = Seq(
      (1L, "spark alpha"),
      (2L, "spark " + Seq.fill(50)("filler").mkString(" "))).toDF("id", "txt")
    val out = TextRank.bm25(docs, "id", "txt", Seq("spark"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L))
  }

  test("repetition signals: hand-computed fractions, deterministic tie-break") {
    val docs = Seq(
      (1L, "a b a b c"),        // bigrams: "a b"x2, "b a", "b c" → top "a b" (3 ch, 2x); 9 chars
      (2L, "x y z w"),          // all bigrams unique → top is tie → lexicographically greatest
      (3L, "q q q q")).toDF("id", "txt")
    val out = TextRank.repetitionSignals(docs, "id", "txt")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(math.abs(out(1L)._1 - 2.0 * 3 / 9) < 1e-12)
    // doc 1 tokens: a:2, b:2, c:1 → dup fraction 4/5
    assert(math.abs(out(1L)._2 - 0.8) < 1e-12)
    // doc 2: ties on count 1 → "z w" wins (greatest); 7 chars text
    assert(math.abs(out(2L)._1 - 1.0 * 3 / 7) < 1e-12)
    assert(out(2L)._2 === 0.0)
    // doc 3: "q q" occurs 3 times, 7 chars; all tokens duplicated
    assert(math.abs(out(3L)._1 - 3.0 * 3 / 7) < 1e-12)
    assert(out(3L)._2 === 1.0)
  }

  test("repetition signals: newlines/tabs split, empties dropped, 1-token docs kept") {
    val docs = Seq(
      (1L, "the cat\nthe dog"),  // \n must split: "the" duplicated
      (2L, "a  b"),              // double space must not create an empty token
      (3L, "hello"),             // single token: no bigram, NOT dropped
      (4L, "   ")).toDF("id", "txt") // whitespace-only: no tokens, no row
    val out = TextRank.repetitionSignals(docs, "id", "txt")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    // doc 1: tokens the,cat,the,dog → dup 2/4; a literal-space split
    // would see "cat\nthe" as one token and report 0.0
    assert(math.abs(out(1L)._2 - 0.5) < 1e-12)
    // doc 2: tokens a,b — no duplicates, no counted empty token
    assert(out(2L)._2 === 0.0)
    // doc 3: single token → top_bigram_frac 0.0, dup 0.0
    assert(out(3L) === ((0.0, 0.0)))
  }

  test("bm25 rejects query terms outside the tokenizer's [a-z0-9] alphabet") {
    val docs = Seq((1L, "covid 19 spark")).toDF("id", "txt")
    // "covid-19" can never equal a token produced by split [^a-z0-9]+ —
    // it would silently empty the result
    val e = intercept[IllegalArgumentException] {
      TextRank.bm25(docs, "id", "txt", Seq("covid-19"))
    }
    assert(e.getMessage.contains("alphabet"))
    intercept[IllegalArgumentException] {
      TextRank.bm25(docs, "id", "txt", Seq(""))
    }
  }

  test("bigram maxVocab: capped-out denominators never yield positive log-probs") {
    // doc 20 repeats (zz,qq) transitions; with maxVocab=2 (keeps aa,bb)
    // the old floor-of-1 denominator scored (c2+1)/(1+V) = 11/3 > 1 —
    // a positive "log-probability" ranking junk as top-quality text.
    val docs = Seq(
      (10L, Seq.fill(20)("aa bb").mkString(" ")),
      (20L, Seq.fill(10)("zz qq").mkString(" "))).toDF("id", "txt")
    val capped = TextRank.bigramLogProb(docs, "id", "txt", maxVocab = 2)
      .select("id", "mean_logprob").as[(Long, Double)].collect().toMap
    // THE invariant: a smoothed probability is < 1, so its log is < 0.
    // The old floor gave capped(20) = mean ln(11/3) ≈ +1.3.
    assert(capped.values.forall(v => v < 0.0 && !v.isNaN),
      s"smoothed log-probs must stay negative, got $capped")
  }

  test("unigram LM score: hand-computed mean log-prob; typical text outranks rare tokens") {
    val docs = Seq(
      (1L, "a a b"),   // common tokens
      (2L, "a z")      // z is rare
    ).toDF("id", "txt")
    val out = TextRank.unigramLogProb(docs, "id", "txt")
      .as[(Long, Double)].collect().toMap
    // counts: a=3, b=1, z=1; total=5
    val expected1 = (2 * math.log(3.0 / 5) + math.log(1.0 / 5)) / 3
    val expected2 = (math.log(3.0 / 5) + math.log(1.0 / 5)) / 2
    assert(math.abs(out(1L) - expected1) < 1e-12)
    assert(math.abs(out(2L) - expected2) < 1e-12)
    assert(out(1L) > out(2L), "rare-token doc must score lower")
  }

  test("chunking: overlap arithmetic, short tail, empty docs produce nothing") {
    val docs = Seq((1L, "abcdefghij"), (2L, ""), (3L, "xy")).toDF("id", "txt")
    val out = TextRank.chunk(docs, "id", "txt", size = 4, overlap = 2)
      .select("id", "chunk_idx", "chunk").as[(Long, Long, String)].collect().toSet
    // NO (1, 4, "ij") row: a start inside the last `overlap` chars
    // yields a strict suffix-subset of the previous chunk
    assert(out === Set(
      (1L, 0L, "abcd"), (1L, 1L, "cdef"), (1L, 2L, "efgh"), (1L, 3L, "ghij"),
      (3L, 0L, "xy")))  // doc shorter than one chunk
    // every character of doc 1 is covered by at least one chunk
    val covered = out.filter(_._1 == 1L).flatMap { case (_, idx, c) =>
      (idx * 2 until idx * 2 + c.length).map(_.toInt) }.toSet
    assert(covered === (0 until 10).toSet)

    // a 1-char-longer doc DOES need the tail chunk (covers > overlap)
    val out11 = TextRank.chunk(Seq((1L, "abcdefghijk")).toDF("id", "txt"),
        "id", "txt", size = 4, overlap = 2)
      .select("chunk").as[String].collect().toSet
    assert(out11.contains("ijk"), "non-redundant tail must survive")
    // no chunk is a substring of another (the dedup property)
    assert(!out11.exists(c => out11.exists(o => o != c && o.contains(c))))
  }

  test("bm25 plan: one doc-level aggregate + broadcast stats, no shuffle join") {
    val docs = Seq((1L, "spark join")).toDF("id", "txt")
    val physical = TextRank.bm25(docs, "id", "txt", Seq("spark", "join", "stream"))
      .queryExecution.executedPlan.toString
    assert(!physical.contains("SortMergeJoin") && !physical.contains("ShuffledHashJoin"),
      s"stats must ride a broadcast, not a shuffle join:\n$physical")
  }
}
