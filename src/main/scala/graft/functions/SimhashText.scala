package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a text column in ONE expression:
  * tokenize (the [[graft.ops.Dedup.tokens]] rule — maximal runs of
  * non-`\s` bytes, `\s` being Java regex's ASCII class), hash each
  * token once per seed, accumulate the 64 ±1 bit sums in a local
  * `long[64]`, pack bits where the sum is positive.
  *
  * Replaces the `aggregate(zip_with(aggregate(transform(filter(split(
  * ...))))))` spelling in [[graft.ops.Dedup.withSimhash]], which never
  * enters whole-stage codegen (higher-order functions are evaluated
  * interpreted) and allocates two 64-element arrays plus a hash struct
  * PER TOKEN OCCURRENCE; the md5 families additionally paid
  * md5 → 32-char hex string → substring → conv(…,16,10) string parsing
  * per token per seed. Here the hash value is read straight from the
  * digest bytes (`first 15 hex chars` ≡ big-endian first 8 bytes
  * `>>> 4`; `first 8 hex chars` ≡ big-endian first 4 bytes) and the
  * only per-token allocation is the digest's own 16-byte output.
  * Bit-identical to the HOF spelling for every family — pinned by
  * OpsSpec's cross-form equality property.
  *
  * Null text → null (the HOF chain propagates split(null)); zero
  * tokens → 0L (empty aggregate over the zero accumulator).
  */
case class SimhashText(child: Expression, family: String)
    extends UnaryExpression {
  require(SimhashText.families.contains(family),
    s"simhash_text family must be one of ${SimhashText.families.mkString(", ")}, got $family")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_text requires a string argument, got $other")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash_text"

  override protected def nullSafeEval(input: Any): Any =
    SimhashText.compute(input.asInstanceOf[UTF8String], family)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // One opaque static call per ROW (the per-token loop lives in
    // compute); inlining the md5 machinery as generated Java would only
    // grow the method toward janino's limit for zero gain.
    val fam = ctx.addReferenceObj("simhashFamily", family, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimhashText.compute($c, $fam)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashText =
    copy(child = newChild)
}

object SimhashText {
  val families: Set[String] = Set("md5", "xxhash64", "md5mix32")

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // Md5Mix32Family's per-seed universal-hash constants, baked once.
  private val mixA: Array[Long] = Array.tabulate(64)(graft.ops.Md5Mix32Family.a)
  private val mixB: Array[Long] = Array.tabulate(64)(graft.ops.Md5Mix32Family.b)
  private val MixP: Long = graft.ops.Md5Mix32Family.P

  @inline private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Seeded 60-bit md5 hash of `prefix ++ tok` — the value of
    * `conv(substring(md5(concat(prefix, tok)), 1, 15), 16, 10)`:
    * big-endian first 8 digest bytes, shifted right 4 (15 hex chars).
    */
  private def md5Hash(prefix: Array[Byte], bytes: Array[Byte], s: Int, e: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(prefix)
    d.update(bytes, s, e - s)
    val h = d.digest()
    (((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
      ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)) >>> 4
  }

  /** The 32-bit md5 base of [[graft.ops.Md5Mix32Family]]: first 8 hex
    * chars = big-endian first 4 digest bytes.
    */
  private def md5Base32(bytes: Array[Byte], s: Int, e: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, s, e - s)
    val h = d.digest()
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  private val pfx0 = "0:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val pfx1 = "1:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Compute the packed simhash. Called per row from both eval paths. */
  def compute(text: UTF8String, family: String): Long = {
    // Invalid UTF-8 takes the decode round-trip so tokens carry the
    // same U+FFFD replacements the regex-split path hashes; valid
    // input (the always case) scans its own bytes directly.
    val bytes =
      if (text.isValid) text.getBytes
      else text.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = bytes.length
    val acc = new Array[Long](64)
    var i = 0
    while (i < n) {
      // skip separators (all ASCII single-byte, safe in UTF-8)
      while (i < n && isSep(bytes(i))) i += 1
      if (i < n) {
        val s = i
        while (i < n && !isSep(bytes(i))) i += 1
        // token = bytes[s, i)
        family match {
          case "md5" =>
            val h1 = md5Hash(pfx0, bytes, s, i)
            val h2 = md5Hash(pfx1, bytes, s, i)
            var j = 0
            while (j < 60) { acc(j) += (((h1 >>> j) & 1L) * 2L - 1L); j += 1 }
            while (j < 64) { acc(j) += (((h2 >>> (j - 60)) & 1L) * 2L - 1L); j += 1 }
          case "xxhash64" =>
            val h1 = XXH64.hashUnsafeBytes(bytes,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s, i - s, 42L)
            var j = 0
            while (j < 64) { acc(j) += (((h1 >>> j) & 1L) * 2L - 1L); j += 1 }
          case _ => // md5mix32
            val x = md5Base32(bytes, s, i)
            var j = 0
            while (j < 64) {
              acc(j) += ((((mixA(j) * x + mixB(j)) % MixP) & 1L) * 2L - 1L)
              j += 1
            }
        }
      }
    }
    var packed = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) packed |= 1L << j; j += 1 }
    packed
  }
}
