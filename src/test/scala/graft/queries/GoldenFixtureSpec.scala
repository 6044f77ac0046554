package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Guard-path pin for the gates' shared seeding device (not a golden
  * hash — here because this spec already lives in the queries package
  * with the private[queries] view it needs).
  */
class SeedGuardSpec extends SparkSpec {
  import spark.implicits._

  test("seedMarkerDups: empty input passes vacuously; out-of-range ids fail " +
      "with the guard's own message, not an NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // max(doc_id) over zero rows is null — the guard must treat that as
    // "no ids to collide" and seed nothing, not die in getLong
    assert(DedupOps.seedMarkerDups(empty).count() == 0)
    val tooBig = Seq((10000001L, "x")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      DedupOps.seedMarkerDups(tooBig).count()
    }
    assert(e.getMessage.contains("re-key offset"))
  }
}

/** Value-level golden pins for the harness gates no oracle engine can
  * express (`text_bpe`: iterative BPE merge training; `text_unigram`:
  * Viterbi-EM unigram tokenizer training;
  * `text_compression_ratio`: a DEFLATE codec signal). The driver's
  * gate for them counts only rows, so a regression that changes VALUES
  * but not cardinality would slip it — these committed hashes close
  * that hole at the suite level.
  *
  * The hash is the driver-gate canonical form: columns sorted by name,
  * every value stringified (nulls as NUL), rows sorted, md5 of the
  * newline-join. The compression gate hashes the ratio BUCKET
  * (floor(ratio·20), 5 % bands) rather than raw deflate byte counts,
  * so a zlib build that compresses a byte or two differently fails
  * only if it moves a document across a band — the signal the
  * downstream band-pass filter actually consumes.
  *
  * If the driver regenerates `/root/testdata` with different CONTENT
  * (not just physical types), these pins go stale: recompute by
  * running the printed actual against a verified-green tree.
  */
class GoldenFixtureSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  private def canonicalMd5(df: DataFrame): String = {
    val cols = df.columns.sorted
    val lines = df.select(cols.map(c => col(c).cast("string")): _*)
      .collect()
      .map(_.toSeq.map(v => if (v == null) "\u0000" else v.toString)
        .mkString("\u0001"))
      .sorted
    java.security.MessageDigest.getInstance("MD5")
      .digest(lines.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  test("text_bpe output at sf0.01 matches its committed golden hash") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val out = SparkEntry.queries("text_bpe")(spark, sfDir)
    val hash = canonicalMd5(out)
    assert(hash == "3c772864f88b8ee129d4bb9b5368a74b",
      s"text_bpe values drifted (got $hash) — the driver gate only counts " +
        "rows for this query, so a value regression surfaces HERE first")
  }

  test("text_unigram output at sf0.01 matches its committed golden hash") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val out = SparkEntry.queries("text_unigram")(spark, sfDir)
    val hash = canonicalMd5(out)
    assert(hash == "3a0a0b2adace1050fba9bb5077ff7f6d",
      s"text_unigram values drifted (got $hash) — Viterbi-EM training is " +
        "rows-only at the driver gate, so a value regression surfaces HERE first")
  }

  test("dedup_embedding_lsh_planned output at sf0.01 matches its committed golden hash") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val out = SparkEntry.queries("dedup_embedding_lsh_planned")(spark, sfDir)
    val hash = canonicalMd5(out)
    assert(hash == "ff056065e7d253fa9956b58a6a666788",
      s"dedup_embedding_lsh_planned values drifted (got $hash) — this entry " +
        "is ALSO oracle-checked since the gate moved to the md5-portable " +
        "plane family; the golden pin stays as a faster first tripwire")
  }

  test("text_compression_ratio buckets at sf0.01 match their committed golden hash") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val out = SparkEntry.queries("text_compression_ratio")(spark, sfDir)
      .select(col("doc_id"), floor(col("ratio") * 20).as("bucket"))
    val hash = canonicalMd5(out)
    assert(hash == "00f3dae0f183c70f0e66e0679050cfe5",
      s"compression-ratio bands drifted (got $hash) — a codec or algebra " +
        "change moved at least one document across a 5% ratio band")
  }
}
