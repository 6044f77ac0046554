package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seeded 64-bit hash families for the sketch operators (MinHash
  * signatures, LSH band hashes, SimHash bit signs).
  *
  * Two members, one contract:
  *  - [[XxHash64Family]] — Spark's native codegen'd xxhash64; the
  *    production default (fastest, full 64-bit range), but it exists in
  *    no other engine, so results are verifiable only by property/recall
  *    specs;
  *  - [[Md5Family]] — 60-bit values from the first 15 hex chars of a
  *    seeded md5. md5 agrees byte-for-byte across engines (the same trick
  *    the deterministic-sampling ops use), so every sketch built with
  *    this family is reproducible in ANSI SQL — in DuckDB:
  *    `('0x' || substr(md5(seed || ':' || s), 1, 15))::BIGINT` — and the
  *    whole MinHash/LSH/SimHash pipeline becomes oracle-checkable.
  *
  * 15 hex chars (not 16) keep the value inside a SIGNED 64-bit int on
  * both engines; min()/equality — all the sketches need — are unaffected
  * by the narrower range.
  */
sealed trait HashFamily {
  /** Seeded hash of a string column → BIGINT. */
  def hashString(seed: Int, s: Column): Column

  /** Hash of an array<bigint> slice with a DYNAMIC seed column (LSH band
    * hashing: seed = band index).
    */
  def hashLongArray(seed: Column, arr: Column): Column

  /** Spark-SQL snippet hashing token variable `tok` ONCE into a struct
    * of per-token hash words — computed one time per token occurrence
    * and reused across all 64 SimHash bits (hashing inside the per-bit
    * lambda would cost 64 hashes per token).
    */
  def tokenHashesSql(tok: String): String

  /** Spark-SQL snippet for the SimHash ±1 sign of bit variable `j`
    * (0..63) read from a [[tokenHashesSql]] struct variable `th`.
    */
  def bitSignSql(th: String, j: String): String

  /** Tag stored in sketch artifacts so a probe can verify the family. */
  def tag: String
}

/** Production default: native codegen'd xxhash64. */
case object XxHash64Family extends HashFamily {
  def hashString(seed: Int, s: Column): Column = xxhash64(lit(seed), s)
  def hashLongArray(seed: Column, arr: Column): Column = xxhash64(seed, arr)
  def tokenHashesSql(tok: String): String =
    s"named_struct('h1', xxhash64($tok))"
  def bitSignSql(th: String, j: String): String =
    s"IF((shiftright($th.h1, $j) & 1L) = 1L, 1L, -1L)"
  val tag = "xxhash64"
}

/** Engine-portable family with ONE md5 per input (vs [[Md5Family]]'s
  * md5 PER SEED): the 32-bit base `x` is the first 8 md5 hex chars,
  * and seed `i` derives its value as the universal hash
  * `(a_i · x + b_i) mod p` with `p = 2³¹ − 1` and per-seed constants
  * from a fixed md5-seeded derivation — so a 32-hash MinHash signature
  * costs 1 md5 + 32 integer ops per gram instead of 32 md5s (the md5
  * dominates [[Dedup.minhashLshPairs]]'s gate time; Spark's
  * subexpression elimination computes the shared md5 once across all
  * seed aggregates, which seed-prefixed md5s structurally prevent).
  *
  * Portability is arithmetic, not just byte-equality: every product is
  * ≤ (2³¹−2)(2³²−1) < 2⁶³, inside SIGNED 64-bit on any engine —
  * DuckDB BIGINT multiplication ERRORS on overflow rather than
  * wrapping, so a 64-bit mixer (splitmix-style) would not replay
  * there. The DuckDB twin is
  * `(a * ('0x' || substr(md5(s), 1, 8))::BIGINT + b) % 2147483647`
  * with a/b interpolated from [[Md5Mix32Family.a]]/[[Md5Mix32Family.b]].
  *
  * 31-bit values (vs [[Md5Family]]'s 60) mean more value collisions
  * between distinct grams (~2⁻³¹ per pair) — irrelevant at minhash's
  * estimator noise (std ≈ √(J(1−J)/numHashes)). Band hashes keep the
  * 60-bit md5 form: they run once per doc × band, not per gram, and
  * bucket equality wants the wider space.
  */
case object Md5Mix32Family extends HashFamily {
  /** 2³¹ − 1 (prime): the universal-hash modulus. */
  val P = 2147483647L

  private def derive(tag: String, i: Int, mod: Long, offset: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag:$i".getBytes("UTF-8"))
    ((BigInt(1, d.take(8)).longValue & Long.MaxValue) % mod) + offset
  }
  /** Per-seed multiplier in [1, P−1] — fixed md5-seeded derivation, so
    * oracle SQL interpolates the SAME constants the Spark plan uses.
    */
  def a(i: Int): Long = derive("mixa", i, P - 1, 1)
  /** Per-seed offset in [0, P−1]. */
  def b(i: Int): Long = derive("mixb", i, P, 0)

  /** The shared 32-bit base: first 8 md5 hex chars → [0, 2³²). */
  def base32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  def hashString(seed: Int, s: Column): Column =
    (lit(a(seed)) * base32(s) + lit(b(seed))) % lit(P)

  /** Band hashing is per doc × band (never per gram), so it keeps the
    * md5-per-seed form — same spelling as [[Md5Family.hashLongArray]].
    */
  def hashLongArray(seed: Column, arr: Column): Column =
    Md5Family.hashLongArray(seed, arr)

  def tokenHashesSql(tok: String): String =
    s"named_struct('h1', CAST(conv(substring(md5($tok), 1, 8), 16, 10) AS BIGINT))"
  private lazy val aArr = (0 until 64).map(i => s"${a(i)}L").mkString("array(", ",", ")")
  private lazy val bArr = (0 until 64).map(i => s"${b(i)}L").mkString("array(", ",", ")")
  def bitSignSql(th: String, j: String): String =
    s"""IF(((element_at($aArr, $j + 1) * $th.h1 +
       |  element_at($bArr, $j + 1)) % ${P}L & 1L) = 1L, 1L, -1L)""".stripMargin

  val tag = "md5mix32"
}

/** Engine-portable md5 family (DuckDB/ANSI-expressible — see trait doc). */
case object Md5Family extends HashFamily {
  private def hx(seedExpr: String, sExpr: String): String =
    s"CAST(conv(substring(md5(concat($seedExpr, ':', $sExpr)), 1, 15), 16, 10) AS BIGINT)"

  /** THE engine-portable 60-bit hash: first 15 md5 hex digits → long.
    * DuckDB twin: `('0x' || substr(md5(x), 1, 15))::BIGINT`. Every
    * spelling of the idiom routes through here (or
    * [[Sampling.md5Uniform]] for the 32-bit uniform variant) so the
    * SQL twins can never drift on prefix width or cast.
    */
  def hex60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hashString(seed: Int, s: Column): Column =
    hex60(concat(lit(s"$seed:"), s))

  /** md5 of "seed:v1,v2,…" — `array_to_string(arr, ',')` in DuckDB. */
  def hashLongArray(seed: Column, arr: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit(":"),
      concat_ws(",", transform(arr, x => x.cast("string"))))), 1, 15), 16, 10)
      .cast("long")

  /** Two seeded 60-bit hashes per token: bits 0..59 come from the
    * 0-seeded hash, 60..63 from the 1-seeded one (a 15-hex-char hash
    * only carries 60 bits).
    */
  def tokenHashesSql(tok: String): String =
    s"named_struct('h1', ${hx("'0'", tok)}, 'h2', ${hx("'1'", tok)})"
  def bitSignSql(th: String, j: String): String =
    s"""IF((shiftright(IF($j < 60, $th.h1, $th.h2),
       |  IF($j < 60, $j, $j - 60)) & 1L) = 1L, 1L, -1L)""".stripMargin

  val tag = "md5"
}
