package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-corpus preparation (the CCNet/Dolma
  * pre-training hygiene step): mask emails, IP addresses, phone-shaped
  * numbers (and any caller-supplied pattern) before documents reach a
  * tokenizer.
  *
  * Scale design: every rule is a codegen'd `regexp_replace` over the
  * row — no shuffle, no UDF, no driver involvement; the patterns are
  * foldable literals so Spark compiles each regex once per operator,
  * not per row. Cost is a linear scan of the corpus, the floor for any
  * full-text rewrite.
  *
  * Patterns deliberately restrict themselves to syntax with identical
  * semantics in java.util.regex and RE2 (character classes, bounded
  * repetition, ASCII `\b`) — no backrefs or lookaround — so the same
  * rule strings drive both the Spark path and a SQL oracle, and would
  * survive a port to an RE2-based engine.
  */
object Redact {

  /** One redaction rule: whole regex matches become `replacement`. */
  final case class Rule(name: String, pattern: String, replacement: String)

  val email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")

  val ipv4: Rule = Rule("ipv4",
    "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>")

  /** NNN-NNNN / NNN-NNN-NNNN shaped tokens. Deliberately conservative:
    * a corpus-wide aggressive number mask destroys more signal (dates,
    * versions, quantities) than it protects.
    */
  val phone: Rule = Rule("phone",
    "\\b[0-9]{3}-([0-9]{3}-)?[0-9]{4}\\b", "<PHONE>")

  val defaultRules: Seq[Rule] = Seq(email, ipv4, phone)

  /** `text` with every rule applied in order. Order matters when rule
    * domains overlap (an IPv4 inside an email is already `<EMAIL>` by
    * the time the ipv4 rule runs) — keep the most specific rule first.
    */
  def redact(text: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.foldLeft(text)((acc, r) => regexp_replace(acc, r.pattern, r.replacement))

  /** Per-rule match count on the ORIGINAL text, one `bigint` column per
    * rule name — the audit trail (how much PII did this corpus hold?),
    * aggregable downstream without re-scanning bodies.
    */
  def counts(text: Column, rules: Seq[Rule] = defaultRules): Seq[Column] =
    rules.map(r => size(regexp_extract_all(text, lit(r.pattern), lit(0)))
      .cast("long").as(s"n_${r.name}"))
}
