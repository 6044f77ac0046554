package graft.ops

import java.nio.charset.{Charset, StandardCharsets}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Mojibake.fixMojibake]] pinned against the JVM's own windows-1252
  * codec as an independent implementation: corrupt with
  * `new String(utf8Bytes, cp1252)`, assert the operator inverts it.
  */
class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private val cp1252 = Charset.forName("windows-1252")

  /** The corruption under repair, via the independent codec. */
  private def corrupt(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), cp1252)

  private def fix(texts: String*): Seq[String] =
    texts.toDF("t").select(Mojibake.fixMojibake(col("t")).as("f"))
      .collect().map(_.getString(0)).toSeq

  private val phrases = Seq(
    "café",                       // 2-byte Latin-1 target
    "naïve — touché",   // em dash: 3-byte, CP1252-special image
    "Grüße",
    "€99 “quoted„",     // euro + curly quotes
    "кофе",        // Cyrillic (D0/D1 leads)
    "😀 emoji 📈") // 4-byte sequences

  test("inverts the cp1252 mis-decode for every phrase family") {
    val moji = phrases.map(corrupt)
    // sanity: the corruption actually mangled something
    moji.zip(phrases).foreach { case (m, p) => assert(m != p) }
    assert(fix(moji: _*) == phrases)
  }

  test("inverts a plain Latin-1 mis-decode, including bytes cp1252 leaves undefined") {
    // U+201D ends in byte 0x9D — undefined in cp1252 (Java decodes it
    // to U+FFFD, unrecoverable, and the guard refuses such rows), but
    // a Latin-1 mis-decode keeps it as the C1 control U+009D, which
    // the repair maps straight back
    val l1 = Seq("”closing”", "café")
      .map(s => new String(s.getBytes(StandardCharsets.UTF_8),
        StandardCharsets.ISO_8859_1))
    assert(fix(l1: _*) == Seq("”closing”", "café"))
    // and the cp1252-lossy corruption of the same phrase is correctly
    // left alone (contains U+FFFD — nothing provable to fix)
    val lossy = corrupt("”closing”")
    assert(lossy.contains('�') && fix(lossy) == Seq(lossy))
  }

  test("clean text is untouched: ASCII, real Latin-1, CJK, a lone lead char") {
    val clean = Seq(
      "plain ascii only",
      "café au lait",   // real Latin-1: the é lead has no valid tail
      "日本 text",   // CJK fails the byte-image guard
      "Ã solo")         // genuine A-tilde: structurally invalid as UTF-8
    assert(fix(clean: _*) == clean)
  }

  test("one pass is idempotent; a double corruption needs exactly two passes") {
    val fixedOnce = fix(phrases.map(corrupt): _*)
    assert(fix(fixedOnce: _*) == phrases)
    // double-corrupt via Latin-1 (lossless for every byte — a double
    // cp1252 round hits undefined bytes and destroys information even
    // for phrases a single round preserves)
    def l1(s: String): String =
      new String(s.getBytes(StandardCharsets.UTF_8),
        StandardCharsets.ISO_8859_1)
    val twice = phrases.map(s => l1(l1(s)))
    val after1 = fix(twice: _*)
    assert(after1 == phrases.map(l1))
    assert(fix(after1: _*) == phrases)
  }

  test("isMojibake is the triage metric; null text passes through as null") {
    val df = Seq(Some(corrupt("café")), Some("plain"), None).toDF("t")
    val n = df.filter(Mojibake.isMojibake(col("t"))).count()
    assert(n == 1)
    val out = df.select(Mojibake.fixMojibake(col("t")).as("f"))
      .collect().map(r => Option(r.getString(0))).toSet
    assert(out == Set(Some("café"), Some("plain"), None))
  }
}
