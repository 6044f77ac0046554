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
