package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokens of a text column in ONE native pass — exactly
  * `filter(split(text, "\\s+", -1), t => t =!= "")` (maximal runs of
  * non-`\s` chars, `\s` being Java regex's ASCII class
  * `[ \t\n\x0B\f\r]`), without the regex engine, the intermediate
  * array, or the interpreted filter lambda. The standard tokenizer of
  * every text operator ([[graft.ops.Dedup.tokens]]).
  *
  * Invalid UTF-8 takes the decode round-trip so tokens carry the same
  * U+FFFD replacements the regex path produces; valid input (the
  * always case) is sliced zero-copy from its own bytes (all `\s`
  * separators are single-byte ASCII, which never occurs inside a
  * multi-byte UTF-8 sequence).
  */
case class WsTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires a string argument, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ws_tokens"

  override protected def nullSafeEval(input: Any): Any =
    WsTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WsTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

object WsTokens {
  @inline private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(text: UTF8String): GenericArrayData = {
    val bytes =
      if (text.isValid) text.getBytes
      else text.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](8)
    var i = 0
    while (i < n) {
      while (i < n && isSep(bytes(i))) i += 1
      if (i < n) {
        val s = i
        while (i < n && !isSep(bytes(i))) i += 1
        out += UTF8String.fromBytes(bytes, s, i - s)
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** md5 hex of every word n-gram of a token array, as ONE native
  * expression: element `i` = `md5(tokens[i] <sp> … <sp> tokens[i+n-1])`
  * (lowercase 32-char hex, byte-identical to Spark's `md5` of the
  * space-joined gram). Output length is `max(numTokens − n + 1, 0)`,
  * so element index IS the gram's 0-based start position — the
  * positioned-gram layout [[graft.ops.SpanDedup]] consumes, without
  * the posexplode + window-lead pass (a full corpus-wide doc-keyed
  * exchange + sort) the lead() formulation pays.
  *
  * A null token element null-propagates to every gram containing it
  * (the `concat` rule of the spelling this replaces); a null array →
  * null.
  */
case class WordNgramMd5Hex(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2 && n <= 64, s"gram length must be in [2, 64], got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_md5 requires an array<string> argument, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_ngram_md5"

  override protected def nullSafeEval(input: Any): Any =
    WordNgramMd5Hex.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgramMd5Hex.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramMd5Hex =
    copy(child = newChild)
}

/** Seeded 64-bit hash of every word n-gram of a token array — the
  * positioned gram KEYS of the substring-dedup family, row-local:
  * element `i` = `family.hashString(seed, tokens[i] <sp> … <sp>
  * tokens[i+n-1])`, byte-identical per [[graft.ops.HashFamily]] tag:
  *
  *  - `md5`: first 15 hex chars of `md5("<seed>:" ++ gram)` as a long
  *    (big-endian first 8 digest bytes `>>> 4`);
  *  - `xxhash64`: Spark's two-arg `xxhash64(lit(seed), gram)` chain —
  *    `hashInt(seed, 42)` seeding `hashUnsafeBytes(gram)`;
  *  - `md5mix32`: `(a(seed) · base32(gram) + b(seed)) mod (2³¹−1)`
  *    with `base32` = first 8 hex chars of `md5(gram)`.
  *
  * Replaces the `transform(sequence(...), i -> hash(concat_ws(" ",
  * slice(tk, i+1, n))))` spelling, which is interpreted AND copies an
  * n-token slice array per position, plus (md5 families) the
  * hex-string → conv(…,16,10) parse per gram. Null token elements
  * null-propagate to their grams; a null array → null; fewer than n
  * tokens → empty array (the `when(size >= n, …).otherwise(array())`
  * convention of the callers this serves).
  */
case class WordNgramHash64(child: Expression, n: Int, seed: Int, family: String)
    extends UnaryExpression {
  require(n >= 1 && n <= 64, s"gram length must be in [1, 64], got $n")
  require(SimhashText.families.contains(family),
    s"word_ngram_hash64 family must be one of ${SimhashText.families.mkString(", ")}, got $family")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_hash64 requires an array<string> argument, got $other")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_ngram_hash64"

  override protected def nullSafeEval(input: Any): Any =
    WordNgramHash64.compute(input.asInstanceOf[ArrayData], n, seed, family)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fam = ctx.addReferenceObj("gramHashFamily", family, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgramHash64.compute($c, $n, $seed, $fam)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramHash64 =
    copy(child = newChild)
}

object WordNgramHash64 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val MixP: Long = graft.ops.Md5Mix32Family.P

  def compute(arr: ArrayData, n: Int, seed: Int, family: String): GenericArrayData = {
    val t = arr.numElements()
    val m = t - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val toks = new Array[Array[Byte]](t)
    var i = 0
    while (i < t) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val seedBytes = s"$seed:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val xxSeed =
      if (family == "xxhash64")
        org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(seed, 42L)
      else 0L
    val mixA = if (family == "md5mix32") graft.ops.Md5Mix32Family.a(seed) else 0L
    val mixB = if (family == "md5mix32") graft.ops.Md5Mix32Family.b(seed) else 0L
    val d = md.get()
    val out = new Array[Any](m)
    var p = 0
    while (p < m) {
      var nul = false
      var j = p
      while (j < p + n && !nul) { if (toks(j) == null) nul = true; j += 1 }
      if (nul) out(p) = null
      else family match {
        case "md5" =>
          d.reset()
          d.update(seedBytes)
          d.update(toks(p))
          var q = p + 1
          while (q < p + n) { d.update(' '.toByte); d.update(toks(q)); q += 1 }
          val h = d.digest()
          out(p) = (((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
            ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
            ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
            ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)) >>> 4
        case "xxhash64" =>
          // xxhash64 hashes the gram STRING: assemble the joined bytes
          // once (total gram bytes, no per-position slice arrays).
          var len = n - 1
          var q = p
          while (q < p + n) { len += toks(q).length; q += 1 }
          val g = new Array[Byte](len)
          var off = 0
          q = p
          while (q < p + n) {
            if (q > p) { g(off) = ' '; off += 1 }
            System.arraycopy(toks(q), 0, g, off, toks(q).length)
            off += toks(q).length
            q += 1
          }
          out(p) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            g, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, xxSeed)
        case _ => // md5mix32
          d.reset()
          d.update(toks(p))
          var q = p + 1
          while (q < p + n) { d.update(' '.toByte); d.update(toks(q)); q += 1 }
          val h = d.digest()
          val base = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
            ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
          out(p) = (mixA * base + mixB) % MixP
      }
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** The word n-grams of a token array as TEXT, positioned: element `i`
  * = `tokens[i] <sp> … <sp> tokens[i+n-1]` — byte-identical to the
  * `concat_ws(" ", …)` spelling over the same tokens. The row-local
  * form of [[graft.ops.CountMin.ngramStream]]'s posexplode +
  * window-lead pass (which shuffled every corpus token doc-keyed, plus
  * a sort, before a single gram existed); frequency consumers keep the
  * multiset by exploding WITHOUT array_distinct. A null token element
  * null-propagates to its grams (the concat rule); a null array →
  * null; fewer than n tokens → empty array.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 64, s"gram length must be in [1, 64], got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires an array<string> argument, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  def compute(arr: ArrayData, n: Int): GenericArrayData = {
    val t = arr.numElements()
    val m = t - n + 1
    if (m <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val toks = new Array[Array[Byte]](t)
    var i = 0
    while (i < t) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[AnyRef](m)
    var p = 0
    while (p < m) {
      var nul = false
      var len = n - 1
      var j = p
      while (j < p + n) {
        if (toks(j) == null) nul = true else len += toks(j).length
        j += 1
      }
      if (nul) out(p) = null
      else {
        val g = new Array[Byte](len)
        var off = 0
        var q = p
        while (q < p + n) {
          if (q > p) { g(off) = ' '; off += 1 }
          System.arraycopy(toks(q), 0, g, off, toks(q).length)
          off += toks(q).length
          q += 1
        }
        out(p) = UTF8String.fromBytes(g)
      }
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Winnowing fingerprint selection (Schleimer et al. — the
  * [[graft.ops.Winnow.fingerprints]] rule) as ONE row-local native
  * expression over a document's positioned gram-digest array: every
  * complete window of `w` consecutive (non-null) grams contributes its
  * MINIMUM digest; a document with fewer than `w` grams contributes
  * its single global minimum. Output = the DISTINCT selected digests
  * (first-selection order; consumers treat it as a set). The window
  * min/count/total/global-min algebra, the doc-keyed window exchange +
  * sort it rode, and the (id, fingerprint) distinct exchange all
  * collapse into this per-row pass. Selection compares digests as
  * UTF-8 byte strings — identical to Spark's string ordering on
  * lowercase hex. Null gram elements (null tokens) are skipped, the
  * old path's `filter(__gh.isNotNull)`; an all-null or empty array →
  * empty output; a null array → null.
  */
case class WinnowFingerprints(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"winnow window must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires an array<string> argument, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFingerprints.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  def compute(arr: ArrayData, w: Int): GenericArrayData = {
    val t = arr.numElements()
    // Non-null grams in position order (the exploded path filtered
    // null __gh rows before windowing, so window adjacency is over the
    // SURVIVING grams).
    val gs = new scala.collection.mutable.ArrayBuffer[UTF8String](t)
    var i = 0
    while (i < t) {
      if (!arr.isNullAt(i)) gs += arr.getUTF8String(i)
      i += 1
    }
    val m = gs.length
    if (m == 0) return new GenericArrayData(new Array[AnyRef](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (m < w) {
      var gmin = gs(0)
      i = 1
      while (i < m) { if (gs(i).compareTo(gmin) < 0) gmin = gs(i); i += 1 }
      seen.add(gmin)
    } else {
      var s = 0
      while (s + w <= m) {
        var wmin = gs(s)
        var j = s + 1
        while (j < s + w) { if (gs(j).compareTo(wmin) < 0) wmin = gs(j); j += 1 }
        seen.add(wmin)
        s += 1
      }
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Both Gopher-style within-document repetition signals
  * ([[graft.ops.TextRank.repetitionSignals]]) in ONE row-local pass
  * over the raw text: `top_bigram_frac` = chars covered by the most
  * frequent word 2-gram (`count · len(bigram) / len(text)`, winner
  * ties to the lexicographically GREATEST bigram — binary UTF-8 order,
  * Spark's string ordering) and `dup_token_frac` = fraction of token
  * occurrences whose token repeats within the document. The dataframe
  * spelling paid a doc-keyed token exchange + sort (bigrams via window
  * lead), two doc-keyed count aggregates and a row_number window;
  * per-document signals need none of that. Tokenization is the
  * [[WsTokens]] rule. Texts with no tokens return NULL (they produce
  * no row in the aggregate form — callers filter); a doc with one
  * token has no bigram and reports top_bigram_frac 0.0.
  */
case class RepetitionSignals(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_signals requires a string argument, got $other")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("top_bigram_frac",
      org.apache.spark.sql.types.DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("dup_token_frac",
      org.apache.spark.sql.types.DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "repetition_signals"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionSignals.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |Object $r = graft.functions.RepetitionSignals.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionSignals =
    copy(child = newChild)
}

object RepetitionSignals {
  def compute(text: UTF8String): AnyRef = {
    val arr = WsTokens.compute(text)
    val t = arr.numElements()
    if (t == 0) return null
    val toks = new Array[UTF8String](t)
    var i = 0
    while (i < t) { toks(i) = arr.getUTF8String(i); i += 1 }
    // dup_token_frac: Σ count(tok)>1 counts / total occurrences.
    val tokCnt = new java.util.HashMap[UTF8String, Int](t * 2)
    i = 0
    while (i < t) {
      tokCnt.merge(toks(i), 1, (a, b) => a + b)
      i += 1
    }
    var dup = 0L
    val it = tokCnt.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > 1) dup += c }
    val dupFrac = dup.toDouble / t.toDouble
    // top_bigram_frac: the most frequent bigram (count desc, bigram
    // DESC on ties), then count · numChars(bigram) / numChars(text) —
    // the exact float-op order of the column spelling
    // (cnt_long · len_double, then / chars_double).
    var topFrac = 0.0
    if (t >= 2) {
      val biCnt = new java.util.HashMap[UTF8String, Int](t * 2)
      i = 0
      while (i < t - 1) {
        val a = toks(i).getBytes
        val b = toks(i + 1).getBytes
        val g = new Array[Byte](a.length + 1 + b.length)
        System.arraycopy(a, 0, g, 0, a.length)
        g(a.length) = ' '
        System.arraycopy(b, 0, g, a.length + 1, b.length)
        biCnt.merge(UTF8String.fromBytes(g), 1, (x, y) => x + y)
        i += 1
      }
      var bestG: UTF8String = null
      var bestC = 0
      val bit = biCnt.entrySet().iterator()
      while (bit.hasNext) {
        val e = bit.next()
        val c = e.getValue
        if (c > bestC || (c == bestC && e.getKey.compareTo(bestG) > 0)) {
          bestC = c; bestG = e.getKey
        }
      }
      topFrac = bestC.toLong.toDouble * bestG.numChars().toDouble /
        text.numChars().toDouble
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](topFrac, dupFrac))
  }
}

object WordNgramMd5Hex {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  def compute(arr: ArrayData, n: Int): GenericArrayData = {
    val t = arr.numElements()
    val m = t - n + 1
    if (m <= 0) return new GenericArrayData(new Array[AnyRef](0))
    // Token bytes fetched once each; a token participates in up to n
    // grams.
    val toks = new Array[Array[Byte]](t)
    var i = 0
    while (i < t) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val d = md.get()
    val out = new Array[AnyRef](m)
    var p = 0
    while (p < m) {
      var nul = false
      var j = p
      while (j < p + n && !nul) { if (toks(j) == null) nul = true; j += 1 }
      if (nul) out(p) = null
      else {
        d.reset()
        d.update(toks(p))
        var q = p + 1
        while (q < p + n) { d.update(' '.toByte); d.update(toks(q)); q += 1 }
        val h = d.digest()
        val hex = new Array[Byte](32)
        var b = 0
        while (b < 16) {
          hex(2 * b) = hexChars((h(b) >> 4) & 0xf).toByte
          hex(2 * b + 1) = hexChars(h(b) & 0xf).toByte
          b += 1
        }
        out(p) = UTF8String.fromBytes(hex)
      }
      p += 1
    }
    new GenericArrayData(out)
  }
}
