package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Volume-scale behavior of this round's new operators — each test is
  * a miniature of the failure mode that matters at 100 TB, run at a
  * size where it is already observable on local[*].
  */
class VolumeStressSpec extends SparkSpec {
  import spark.implicits._

  test("bloom pruning at 1M facts cuts the joined row count by ~selectivity") {
    // 1M facts, dim keeps 1% of the key space: >95% of fact rows must
    // die in the scan-local prune, never reaching the join shuffle.
    val fact = spark.range(0, 1000000).select(col("id").as("k"))
    val dim = spark.range(0, 1000000, 100).select(col("id").as("dk")) // 10k keys
    val pruned = BloomJoin.pruneLarge(fact, "k", dim, "dk", expectedItems = 10000)
    val n = pruned.count()
    assert(n >= 10000L, "all true matches must survive")
    assert(n <= 30000L, s"prune must remove ~99% of facts, kept $n")
  }

  test("semanticDedup caps a degenerate mega-cluster instead of exploding") {
    // 50k identical-direction vectors in ONE cluster: quadratic pair
    // expansion would be 1.25 billion pairs. The cap must skip the
    // cluster (keeping all rows) and finish fast.
    val rows = spark.range(0, 50000)
      .select(col("id"), array(lit(1f), lit(1f), lit(0.5f)).as("vec"))
    val out = Similarity.semanticDedup(rows, "id", "vec",
      Similarity.signBitSketch(col("vec"), 2), threshold = 0.9,
      maxCluster = 1000)
    assert(out.count() == 50000L, "oversized cluster must pass through unjudged")
  }

  test("vocab build at 1M synthetic tokens stays a count-then-cut plan") {
    // 100k docs × 10 tokens: one guaranteed-dominant token plus ~97
    // uniform tail tokens; top-50 vocab must rank exactly.
    val docs = spark.range(0, 100000).select(col("id"),
      concat_ws(" ", (lit("w_top") +: (1 until 10).map(i =>
        concat(lit("w"), pmod(col("id") + lit(i * 37), lit(97))))): _*).as("text"))
    val v = Vocab.build(docs, "text", vocabSize = 50)
    assert(v.count() == 50L)
    assert(v.filter(col("token_id") === 1)
      .as[(String, Long, Long)].first() == (("w_top", 100000L, 1L)))
  }

  test("removeNearDuplicates on a 200k-row corpus with a 2k-pair graph " +
    "only anti-joins ids") {
    val corpus = spark.range(0, 200000).select(col("id"), lit("body").as("b"))
    val pairs = spark.range(0, 2000)
      .select(col("id").as("id_a"), (col("id") + 100000).as("id_b"))
    val out = Dedup.removeNearDuplicates(corpus, "id", pairs)
    assert(out.count() == 198000L) // 2000 losers (the id_b side)
  }
}
