package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point registering the engine's native
  * expressions into the SQL function registry, so both the Column API
  * and `spark.sql("SELECT iso_duration_seconds(...)")` reach them.
  *
  * Use via `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.isoDurationSeconds)
    ext.injectFunction(GraftExtensions.vecDot)
    ext.injectFunction(GraftExtensions.rfc1123)
    ext.injectFunction(GraftExtensions.calendarAgeIso)
    ext.injectFunction(GraftExtensions.nfcNormalize)
    ext.injectFunction(GraftExtensions.lowerRoot)
  }
}

object GraftExtensions {

  private[functions] val isoDurationSeconds
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("iso_duration_seconds"),
    new ExpressionInfo(classOf[IsoDurationSeconds].getName, "iso_duration_seconds"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "iso_duration_seconds takes exactly one argument")
      IsoDurationSeconds(children.head)
    })

  private[functions] val vecDot
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "vec_dot takes exactly two arguments")
      DotProduct(children.head, children(1))
    })

  private[functions] val rfc1123
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rfc1123_timestamp"),
    new ExpressionInfo(classOf[Rfc1123Timestamp].getName, "rfc1123_timestamp"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "rfc1123_timestamp takes exactly one argument")
      Rfc1123Timestamp(children.head)
    })

  private[functions] val calendarAgeIso
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("calendar_age_iso"),
    new ExpressionInfo(classOf[CalendarAgeIso].getName, "calendar_age_iso"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "calendar_age_iso takes exactly two arguments")
      CalendarAgeIso(children.head, children(1))
    })

  private[functions] val nfcNormalize
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "nfc_normalize takes exactly one argument")
      NfcNormalize(children.head)
    })

  private[functions] val lowerRoot
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lower_root"),
    new ExpressionInfo(classOf[LowerRoot].getName, "lower_root"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "lower_root takes exactly one argument")
      LowerRoot(children.head)
    })

  /** Imperative registration for an existing session (tests, Verify). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(isoDurationSeconds, vecDot, rfc1123, calendarAgeIso, nfcNormalize,
        lowerRoot).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }

  /** Column-API access without SQL registration. */
  def iso_duration_seconds(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(IsoDurationSeconds(GraftColumnBridge.expression(c)))
  }

  /** Native url → registrable domain (see [[UrlDomains]]). */
  def url_registrable_domain(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(UrlRegistrableDomain(GraftColumnBridge.expression(c)))
  }

  /** Native dot product over two array<double> columns. */
  def vec_dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** All hyperplane-LSH sign buckets of one vector as array<long> —
    * ONE constant-code-size native expression for the whole (tables ×
    * bits) sketch; the unrolled per-plane vec_dot spelling grows the
    * generated method linearly with the planned shape and crossed
    * janino's 64 KB limit (silent interpreted fallback) at the 10×
    * rehearsal. Not SQL-registered: the plane tensor is a driver-side
    * parameter, not a literal a query could spell.
    */
  def lsh_sign_buckets(vec: Column, planes: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(LshSignBuckets(GraftColumnBridge.expression(vec), planes))
  }

  /** Whitespace tokens (the [[graft.ops.Dedup.tokens]] rule) in one
    * native pass — no regex engine, no interpreted filter lambda.
    */
  def ws_tokens(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WsTokens(GraftColumnBridge.expression(c)))
  }

  /** md5 hex of every word n-gram of a token array; element index =
    * gram start position (the positioned-gram layout, row-local).
    */
  def word_ngram_md5(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      WordNgramMd5Hex(GraftColumnBridge.expression(tokens), n))
  }

  /** The word n-grams of a token array as TEXT, positioned — the
    * row-local multiset form frequency consumers explode (see
    * [[WordNgrams]]); byte-identical to the concat_ws spelling.
    */
  def word_ngrams(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WordNgrams(GraftColumnBridge.expression(tokens), n))
  }

  /** Vocabulary encoding of a token array against a driver-artifact
    * vocab map (see [[VocabEncode]]): struct(token_ids, n_tokens,
    * n_unk, n_in_vocab), row-local.
    */
  def vocab_encode(tokens: Column, vocab: Array[(String, Long)], unkId: Long): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      VocabEncode(GraftColumnBridge.expression(tokens), vocab, unkId))
  }

  /** Both Gopher repetition signals of one text in one row-local pass
    * (see [[RepetitionSignals]]): struct(top_bigram_frac,
    * dup_token_frac), null for token-less text.
    */
  def repetition_signals(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      RepetitionSignals(GraftColumnBridge.expression(text)))
  }

  /** Winnowing fingerprint selection over a positioned gram-digest
    * array, row-local (see [[WinnowFingerprints]]).
    */
  def winnow_fingerprints(grams: Column, w: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      WinnowFingerprints(GraftColumnBridge.expression(grams), w))
  }

  /** Seeded 64-bit hash of every word n-gram of a token array —
    * row-local positioned gram keys, byte-identical per
    * [[graft.ops.HashFamily]] tag (see [[WordNgramHash64]]).
    */
  def word_ngram_hash64(tokens: Column, n: Int, seed: Int, family: String): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      WordNgramHash64(GraftColumnBridge.expression(tokens), n, seed, family))
  }

  /** The whole MinHash signature of one document's token array as ONE
    * row-local native expression (see [[MinhashSig]]) — byte-identical
    * to [[graft.ops.Dedup.minhashSignatures]]'s aggregate form, with
    * no token exchange and no groupBy.
    */
  def minhash_sig(tokens: Column, n: Int, numHashes: Int, family: String): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      MinhashSig(GraftColumnBridge.expression(tokens), n, numHashes, family))
  }

  /** RFC-822/1123 datetime parse → timestamp (null when unparseable). */
  def rfc1123_timestamp(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(Rfc1123Timestamp(GraftColumnBridge.expression(c)))
  }

  /** Calendar age between two dates as ISO-8601 (zero parts omitted). */
  def calendar_age_iso(start: Column, end: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(CalendarAgeIso(
      GraftColumnBridge.expression(start), GraftColumnBridge.expression(end)))
  }

  /** Unicode NFC normalization (ASCII fast path, codegen'd). */
  def nfc_normalize(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
  }

  /** Locale.ROOT lowercase (host-locale-independent, codegen'd). */
  def lower_root(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(LowerRoot(GraftColumnBridge.expression(c)))
  }
}
