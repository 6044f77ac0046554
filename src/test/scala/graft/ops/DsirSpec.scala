package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 4096

  /** Bucket of a term under the op's own hash (collision-free for the
    * handful of distinct test terms at B=4096 — asserted in setup).
    */
  private def bucket(term: String): Int =
    Seq(term).toDF("t").select(Dsir.bucketOf(col("t"), B).cast("int"))
      .head().getInt(0)

  test("featureTerms yields lowercased unigrams plus space-joined bigrams") {
    val out = Seq("The cat Sat", "x", "", null.asInstanceOf[String])
      .toDF("t").select(Dsir.featureTerms(col("t"))).as[Seq[String]].collect()
    assert(out(0) == Seq("the", "cat", "sat", "the cat", "cat sat"))
    assert(out(1) == Seq("x"))
    assert(out(2) == Seq.empty && out(3) == Seq.empty)
  }

  test("score sums milli weights over feature occurrences, exactly") {
    val terms = Seq("the", "cat", "the cat")
    assert(terms.map(bucket).distinct.size == 3, "test terms must not collide")
    val w = Map(bucket("the") -> 100L, bucket("cat") -> -40L,
      bucket("the cat") -> 7L)
    val df = Seq((1L, "the cat"), (2L, "the the"), (3L, "zzz")).toDF("id", "text")
    val s = Dsir.score(df, "id", "text", w, B)
      .as[(Long, Long)].collect().toMap
    // doc 1: the + cat + "the cat" = 100 - 40 + 7
    assert(s(1L) == 67L)
    // doc 2: the×2 + bigram "the the" (unweighted) = 200
    assert(s(2L) == 200L)
    assert(s(3L) == 0L)
  }

  test("fitWeightsMilli matches the hand-computed smoothed log ratio") {
    val target = Seq(1L -> "aa aa", 2L -> "aa").toDF("id", "text")
    val raw = Seq(1L -> "bb", 2L -> "bb bb").toDF("id", "text")
    val w = Dsir.fitWeightsMilli(target, raw, "text", B, alpha = 0.5)
    // target occurrences: aa×3 + bigram "aa aa"×1; raw: bb×3 + "bb bb"×1
    val tTot = 4 + 0.5 * B
    val rTot = 4 + 0.5 * B
    def lam(tc: Long, rc: Long): Long = StrictMath.round(
      (StrictMath.log((tc + 0.5) / tTot) - StrictMath.log((rc + 0.5) / rTot)) * 1000.0)
    assert(w(bucket("aa")) == lam(3, 0))
    assert(w(bucket("bb")) == lam(0, 3))
    assert(w(bucket("aa aa")) == lam(1, 0))
    // unseen-everywhere buckets carry weight 0 and are dropped from the map
    assert(!w.contains(bucket("zz")))
  }

  test("resampleTopK keeps the k best with the md5 tiebreak; Gumbel variant is run-stable") {
    val w = Map(bucket("hot") -> 1000L)
    val df = (1L to 20L).map(i => (i, if (i <= 5) "hot" else "cold")).toDF("id", "text")
    val top = Dsir.resampleTopK(df, "id", "text", w, B, k = 7)
      .as[(Long, Long)].collect()
    assert(top.take(5).forall(_._2 == 1000L))
    assert(top.map(_._1).take(5).toSet == Set(1L, 2L, 3L, 4L, 5L))
    // the 2 zero-score slots are the md5-smallest cold ids — recompute
    val coldByMd5 = (6L to 20L).map(i => i ->
      java.security.MessageDigest.getInstance("MD5").digest(i.toString.getBytes)
        .map("%02x".format(_)).mkString).sortBy(_._2).map(_._1).take(2).toSet
    assert(top.drop(5).map(_._1).toSet == coldByMd5)

    val g1 = Dsir.resampleGumbel(df, "id", "text", w, B, k = 7, seed = 9)
      .select("id").as[Long].collect().toSeq
    val g2 = Dsir.resampleGumbel(df.repartition(7), "id", "text", w, B, k = 7, seed = 9)
      .select("id").as[Long].collect().toSeq
    assert(g1 == g2 && g1.size == 7)
  }
}
