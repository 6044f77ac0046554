package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole MinHash signature of one document as ONE native
  * expression over its token array: distinct word n-grams (hash-set,
  * first pass), then per seed `i < numHashes` the min of
  * `family.hashString(i, gram)` over the distinct grams — exactly
  * [[graft.ops.Dedup.minhashSignatures]]'s `min()` aggregates, but
  * row-local: the shingleRows posexplode + window-lead pass (a
  * corpus-wide doc-keyed token exchange) and the groupBy(id) signature
  * aggregate (a second full exchange of gram rows) never happen — the
  * signature is born in the scan task.
  *
  * Per-family hash values are byte-identical to the Column spellings
  * (OpsSpec pins the row-local signature against the aggregate form):
  *  - `md5`: first 15 hex chars of `md5("<i>:" ++ gram)` per seed;
  *  - `md5mix32`: ONE md5 per gram (first 8 hex chars → base), then
  *    `(a(i)·base + b(i)) mod (2³¹−1)` per seed — the same
  *    1-md5-per-gram economy Spark's subexpression elimination bought
  *    the aggregate form;
  *  - `xxhash64`: `xxhash64(lit(i), gram)` = `hashInt(i, 42)` seeding
  *    `hashUnsafeBytes(gram)`.
  *
  * Returns NULL when the document has no n-gram (fewer than n tokens,
  * or null token array): such documents have NO signature row in the
  * aggregate form — callers filter nulls to reproduce that absence.
  */
case class MinhashSig(child: Expression, n: Int, numHashes: Int, family: String)
    extends UnaryExpression {
  require(n >= 1 && n <= 8, s"shingle width out of range, got $n")
  require(numHashes >= 1 && numHashes <= 512, s"numHashes out of range, got $numHashes")
  require(SimhashText.families.contains(family),
    s"minhash_sig family must be one of ${SimhashText.families.mkString(", ")}, got $family")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires an array<string> argument, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  // Per-seed constants, derived once per expression instance.
  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i =>
      s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  @transient private lazy val xxSeeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))
  @transient private lazy val mixA: Array[Long] =
    Array.tabulate(numHashes)(graft.ops.Md5Mix32Family.a)
  @transient private lazy val mixB: Array[Long] =
    Array.tabulate(numHashes)(graft.ops.Md5Mix32Family.b)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this,
      "graft.functions.MinhashSig")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |Object $r = $self.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  }

  def compute(arr: ArrayData): AnyRef = {
    val t = arr.numElements()
    val m = t - n + 1
    if (m <= 0) return null
    // Distinct grams via a byte-exact hash set of the joined gram.
    val seen = new java.util.HashSet[UTF8String](math.min(m * 2, 1 << 16))
    val toks = new Array[Array[Byte]](t)
    var i = 0
    while (i < t) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val d = MinhashSig.md.get()
    var p = 0
    while (p < m) {
      // A gram touching a null token never existed in the aggregate
      // form (shingleRows filters null leads) — skip the position.
      var nul = false
      var len = n - 1
      var q = p
      while (q < p + n) {
        if (toks(q) == null) nul = true else len += toks(q).length
        q += 1
      }
      if (nul) { p += 1 }
      else {
      val g = new Array[Byte](len)
      var off = 0
      q = p
      while (q < p + n) {
        if (q > p) { g(off) = ' '; off += 1 }
        System.arraycopy(toks(q), 0, g, off, toks(q).length)
        off += toks(q).length
        q += 1
      }
      if (seen.add(UTF8String.fromBytes(g))) {
        family match {
          case "md5" =>
            var s = 0
            while (s < numHashes) {
              d.reset()
              d.update(seedPrefixes(s))
              d.update(g)
              val h = d.digest()
              val v = (((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
                ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
                ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
                ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)) >>> 4
              if (v < sig(s)) sig(s) = v
              s += 1
            }
          case "xxhash64" =>
            var s = 0
            while (s < numHashes) {
              val v = XXH64.hashUnsafeBytes(g,
                org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, xxSeeds(s))
              if (v < sig(s)) sig(s) = v
              s += 1
            }
          case _ => // md5mix32
            d.reset()
            d.update(g)
            val h = d.digest()
            val base = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
              ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
            var s = 0
            while (s < numHashes) {
              val v = (mixA(s) * base + mixB(s)) % MinhashSig.MixP
              if (v < sig(s)) sig(s) = v
              s += 1
            }
        }
      }
      p += 1
      }
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  private val MixP: Long = graft.ops.Md5Mix32Family.P
  private[functions] val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
