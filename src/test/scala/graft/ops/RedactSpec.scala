package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def one(s: String): (String, Long, Long, Long) =
    Seq(s).toDF("t")
      .select((Redact.redact(col("t")) +: Redact.counts(col("t"))): _*)
      .as[(String, Long, Long, Long)].first()

  test("redacts emails, IPs and phone shapes; counts match") {
    val (red, nEmail, nIp, nPhone) =
      one("mail bob.smith+x@corp.example.org from 192.168.0.1 call 555-0123 or 800-555-1234")
    assert(red == "mail <EMAIL> from <IP> call <PHONE> or <PHONE>")
    assert((nEmail, nIp, nPhone) == (1L, 1L, 2L))
  }

  test("clean text is untouched with zero counts") {
    val (red, nEmail, nIp, nPhone) = one("no pii here, version 1.2 of part 42")
    assert(red == "no pii here, version 1.2 of part 42")
    assert((nEmail, nIp, nPhone) == (0L, 0L, 0L))
  }

  test("redaction is idempotent") {
    val once = one("write a@b.co")._1
    assert(one(once)._1 == once)
  }

  test("an IPv4 inside an email is masked as part of the email (rule order)") {
    val (red, nEmail, nIp, _) = one("root@10.0.0.1.example.com")
    assert(red == "<EMAIL>")
    // the count audit sees both patterns on the ORIGINAL text
    assert(nEmail == 1L && nIp == 1L)
  }

  test("version numbers and dates survive the conservative phone rule") {
    val (red, _, _, nPhone) = one("v2.4.1 released 2024-01-02, build 123-45")
    assert(red == "v2.4.1 released 2024-01-02, build 123-45")
    assert(nPhone == 0L)
  }

  test("custom rules compose in order") {
    val ssn = Redact.Rule("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>")
    val out = Seq("id 123-45-6789 tel 555-0100").toDF("t")
      .select(Redact.redact(col("t"), Seq(ssn) ++ Redact.defaultRules).as("r"))
      .as[String].first()
    assert(out == "id <SSN> tel <PHONE>")
  }
}
