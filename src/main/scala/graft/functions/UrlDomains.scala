package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native URL → registrable-domain extraction: one compact generated
  * call instead of the equivalent five-regex column chain
  * (`Urls.registrableDomain(Urls.hostOf(url))`).
  *
  * Why it exists: the column-algebra chain references its own
  * intermediates many times, and in codegen contexts WITHOUT
  * subexpression elimination — join keys, Generate (explode) consume
  * paths — every reference re-expands the whole subtree. The round-8
  * codegen audit caught two registry queries blowing janino's 64 KB
  * method limit exactly this way and silently running interpreted.
  * This expression generates ONE static call (`UrlDomains.eval`), so
  * it is immune to the context, and the hot parse is a single
  * char-walk instead of five regex executions per row.
  *
  * Semantics are pinned EQUAL to the column chain (UrlsSpec holds the
  * equivalence property over the adversarial URL corpus), with one
  * deliberate divergence: lowering is `Locale.ROOT` (the chain uses
  * builtin `lower`, whose non-ASCII slow path takes the JVM default
  * locale — see [[LowerRoot]]; ROOT is what the DuckDB oracle computes
  * and what the repo's locale sweep standardizes on).
  */
object UrlDomains {

  /** The multi-part public suffixes [[eval]] recognizes — canonical
    * home of the list `graft.ops.Urls.multiPartSuffixes` re-exports.
    */
  val multiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "co.in", "co.nz", "com.br", "com.cn", "com.mx",
    "com.ar", "com.tr", "co.za", "com.sg", "com.hk")

  private val MultiPartSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    multiPartSuffixes.foreach(s.add)
    s
  }

  /** Lowercased canonical host of a URL: userinfo, default port and
    * leading `www.` stripped; null when there is no valid
    * `scheme://host` prefix. Equal to `Urls.hostOf` by construction.
    */
  def host(url: UTF8String): UTF8String = {
    if (url == null) return null
    val u = url.toString
    val sep = u.indexOf("://")
    if (sep <= 0) return null
    // scheme grammar [A-Za-z][A-Za-z0-9+.-]* — anything else is the
    // regex chain's no-match → null
    val c0 = u.charAt(0)
    if (!((c0 >= 'A' && c0 <= 'Z') || (c0 >= 'a' && c0 <= 'z'))) return null
    var i = 1
    while (i < sep) {
      val c = u.charAt(i)
      val ok = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
      if (!ok) return null
      i += 1
    }
    val scheme = u.substring(0, sep).toLowerCase(Locale.ROOT)
    var j = sep + 3
    val len = u.length
    var end = len
    while (j < end) {
      val c = u.charAt(j)
      if (c == '/' || c == '?' || c == '#') end = j else j += 1
    }
    var hp = u.substring(sep + 3, end).toLowerCase(Locale.ROOT)
    val at = hp.indexOf('@')
    if (at >= 0) hp = hp.substring(at + 1)
    val noPort =
      if (scheme == "http" && hp.endsWith(":80")) hp.dropRight(3)
      else if (scheme == "https" && hp.endsWith(":443")) hp.dropRight(4)
      else hp
    val h = if (noPort.startsWith("www.")) noPort.substring(4) else noPort
    if (h.isEmpty) null else UTF8String.fromString(h)
  }

  /** Registrable domain of a HOST (last two labels, or three over a
    * known multi-part suffix). Equal to `Urls.registrableDomain`.
    */
  def registrable(host: UTF8String): UTF8String = {
    if (host == null) return null
    val h = host.toString
    val labels = h.split("\\.", -1)
    val n = labels.length
    if (n <= 2) return host
    val lastTwo = labels(n - 2) + "." + labels(n - 1)
    val take = if (MultiPartSet.contains(lastTwo)) 3 else 2
    UTF8String.fromString(labels.slice(n - take, n).mkString("."))
  }

  /** url → registrable domain in one call (the generated-code entry). */
  def eval(url: UTF8String): UTF8String = registrable(host(url))
}

/** `url_registrable_domain(url)` — see [[UrlDomains]]. Null for null
  * input AND for rows with no parseable `scheme://host` (hence the
  * explicit isNull in codegen; `defineCodeGen` would mis-handle the
  * latter).
  */
case class UrlRegistrableDomain(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_registrable_domain requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_registrable_domain"

  override protected def nullSafeEval(input: Any): Any =
    UrlDomains.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlDomains.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = ($cls).eval($c);
      |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UrlRegistrableDomain =
    copy(child = newChild)
}
