package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication operators.
  *
  * Scale design (100 TB stance):
  *  - exact dedup is a hash-groupBy on a digest — one shuffle over a
  *    16-byte key, never over the document bodies;
  *  - MinHash+LSH turns the O(n²) near-dup problem into
  *    shingle-hash → signature → band-bucket join: only documents that
  *    collide in a band are compared, so the shuffle volume is
  *    O(n · bands), and the verify step touches candidate pairs only;
  *  - exact pairwise Jaccard is kept for oracle verification on bounded
  *    subsets (it IS quadratic — never run it unbounded at scale);
  *  - everything is pure column algebra (codegen'd); no UDFs, no
  *    driver-side loops.
  */
object Dedup {

  /** Whitespace tokens of a trimmed text column. */
  def tokens(text: Column): Column =
    when(trim(text) === "", array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Distinct word n-gram shingles ("w1 w2 w3"), empty when the document
    * has fewer than `n` tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))
    array_distinct(when(size(toks) >= n, grams)
      .otherwise(array().cast("array<string>")))
  }

  /** Exact dedup: digest-groupBy; keeps the smallest id per text group.
    * Returns (fp, keeper_id, n_dupes).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dupes"))

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum xxhash64 over the shingle set. Column type:
    * array<bigint> of length numHashes.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleCol, s => xxhash64(lit(seed), s)))
    }: _*)

  /** LSH candidate pairs: signatures are cut into `bands`; documents
    * sharing any band hash become a candidate pair. Pairs are generated
    * inside each bucket with a self-combination over the bucket's
    * (bounded) member list, then verified with exact Jaccard over the
    * shingle sets. Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = withSig.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("|",
          slice(col("sig"), b * lit(rows) + lit(1), lit(rows)).cast("array<string>")))))
        .as(Seq("band_id", "band_hash")))
    // Bucket members, then in-bucket pair expansion. Bucket sizes are
    // bounded in practice (near-dup clusters); a pathological mega-bucket
    // would surface in `n_members` and can be salted/capped upstream.
    val buckets = banded.groupBy(col("band_id"), col("band_hash"))
      .agg(collect_set(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(sort_array(col("ids")).as("ids"))
    val pairs = buckets.select(explode(flatten(transform(col("ids"),
        (x, i) => transform(slice(col("ids"), i + lit(2), lit(1000000)),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    // Verify candidates with exact Jaccard over shingle sets.
    val sh = withSig.select(col("id"), col("sh"))
    pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact pairwise n-gram Jaccard over ALL pairs of `df` — quadratic;
    * for oracle verification / bounded subsets only.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val exploded = sh.select(col("id"), explode(col("sh")).as("g"))
    val counts = sh.select(col("id"), size(col("sh")).as("n_sh"))
    val common = exploded.as("x")
      .join(exploded.as("y"), col("x.g") === col("y.g") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(counts.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(counts.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
         (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over the token multiset, appended as column `out`.
    * Bit j of the result is set iff the sum over tokens of ±1 (sign from
    * bit j of the token's xxhash64) is positive. Pure column algebra
    * (higher-order functions + bit ops) — distributed, no UDF.
    */
  def withSimhash(df: DataFrame, textCol: String, out: String = "simhash"): DataFrame = {
    val t = s"__simhash_toks"
    df.withColumn(t, tokens(col(textCol)))
      .withColumn(out, expr(
        s"""aggregate(
           |  zip_with(
           |    aggregate($t, array_repeat(0L, 64),
           |      (acc, tok) -> zip_with(acc,
           |        transform(sequence(0, 63),
           |          j -> IF((shiftright(xxhash64(tok), j) & 1L) = 1L, 1L, -1L)),
           |        (a, b) -> a + b)),
           |    sequence(0, 63),
           |    (v, j) -> IF(v > 0, shiftleft(1L, j), 0L)),
           |  0L, (a, b) -> a | b)""".stripMargin))
      .drop(t)
  }

  /** Hamming distance between two simhash values. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
