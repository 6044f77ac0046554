package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.removeNearDuplicates]] — pair graph → deduplicated corpus. */
class DedupRemoveSpec extends SparkSpec {
  import spark.implicits._

  test("each transitive duplicate group keeps exactly its smallest id") {
    val corpus = (1L to 7L).map(i => (i, s"doc$i")).toDF("id", "body")
    // components: {1,2,3} (chain), {5,6}; 4 and 7 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.removeNearDuplicates(corpus, "id", pairs)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 4L, 5L, 7L))
  }

  test("an empty pair set keeps the whole corpus") {
    val corpus = (1L to 3L).map(i => (i, "x")).toDF("id", "body")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.removeNearDuplicates(corpus, "id", pairs).count() == 3L)
  }

  test("survivors keep all original columns") {
    val corpus = Seq((1L, "a", 9), (2L, "b", 8)).toDF("id", "body", "extra")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.removeNearDuplicates(corpus, "id", pairs)
    assert(out.columns.toSeq == Seq("id", "body", "extra"))
    assert(out.as[(Long, String, Int)].collect().toSeq == Seq((1L, "a", 9)))
  }
}
