package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Warc]] pinned on hand-built record streams — each case targets
  * one grammar hazard from the object doc.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  /** A well-formed record with the given headers and payload. */
  private def rec(payload: Array[Byte], headers: (String, String)*): Array[Byte] = {
    val h = headers.map { case (k, v) => s"$k: $v\r\n" }.mkString
    val head = s"WARC/1.0\r\n${h}Content-Length: ${payload.length}\r\n\r\n"
    head.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def wet(uri: String, text: String): Array[Byte] =
    rec(text.getBytes(UTF_8),
      "WARC-Type" -> "conversion", "WARC-Target-URI" -> uri,
      "WARC-Date" -> "2026-08-15T00:00:00Z",
      "WARC-Record-ID" -> s"<urn:test:$uri>",
      "Content-Type" -> "text/plain")

  private def gz(bytes: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bytes.foreach { b => // one gzip MEMBER per record, the CC layout
      val g = new GZIPOutputStream(out); g.write(b); g.finish()
    }
    out.toByteArray
  }

  test("walks multiple records; headers are case-insensitive and folded") {
    val r1 = wet("http://a/1", "alpha text")
    val r2 = ("WARC/1.1\r\nwarc-type: conversion\r\n" +
      "WARC-Target-URI: http://a/2\r\n continued-uri-part\r\n" +
      "CONTENT-LENGTH: 4\r\n\r\nbeta\r\n\r\n").getBytes(UTF_8)
    val (rs, err) = Warc.parse(r1 ++ r2)
    assert(err.isEmpty && rs.size == 2)
    assert(rs(0).targetUri.contains("http://a/1") &&
      new String(rs(0).payload, UTF_8) == "alpha text")
    // the continuation line folded into the URI value with one space
    assert(rs(1).targetUri.contains("http://a/2 continued-uri-part"))
    assert(rs(1).contentLength == 4 && new String(rs(1).payload, UTF_8) == "beta")
  }

  test("walking is length-driven: a payload containing \\r\\n\\r\\nWARC/1.0 stays one record") {
    val trap = "first\r\n\r\nWARC/1.0\r\nFake: yes\r\n\r\n tail"
    val (rs, err) = Warc.parse(rec(trap.getBytes(UTF_8)) ++ wet("http://b/2", "z"))
    assert(err.isEmpty && rs.size == 2)
    assert(new String(rs(0).payload, UTF_8) == trap)
    assert(rs(1).targetUri.contains("http://b/2"))
  }

  test("gzip blobs parse transparently, including multi-member (.warc.gz) layout") {
    val a = wet("http://g/1", "in member one")
    val b = wet("http://g/2", "in member two")
    val (rs, err) = Warc.parse(gz(a, b))
    assert(err.isEmpty && rs.map(_.targetUri.get) ==
      Vector("http://g/1", "http://g/2"))
    val (one, err1) = Warc.parse(gz(a ++ b)) // single member, two records
    assert(err1.isEmpty && one.size == 2)
  }

  test("malformed tails: lenient keeps the good prefix and reports; strict throws") {
    val good = wet("http://m/1", "ok")
    val cases = Seq(
      "WARC/1.0\r\nContent-Length: 99\r\n\r\nshort".getBytes(UTF_8)
        -> "EOF inside",
      "WARC/1.0\r\nNo-Length: x\r\n\r\n".getBytes(UTF_8)
        -> "missing Content-Length",
      "WARC/1.0\r\nContent-Length: -5\r\n\r\n".getBytes(UTF_8)
        -> "out of range",
      "not a warc at all".getBytes(UTF_8)
        -> "expected WARC/",
      // Content-Length shorter than the real payload: the overrun is
      // caught AT the separator, not one record later
      ("WARC/1.0\r\nContent-Length: 2\r\n\r\nlonger\r\n\r\n").getBytes(UTF_8)
        -> "bad Content-Length")
    cases.foreach { case (bad, msg) =>
      val (rs, err) = Warc.parse(good ++ bad)
      assert(rs.size == 1 && err.exists(_.contains(msg)), s"$msg -> $err")
      val ex = intercept[Warc.WarcFormatException](
        Warc.parse(good ++ bad, strict = true))
      assert(ex.getMessage.contains("record 1"), ex.getMessage)
    }
  }

  test("property: random truncation × plain/gzip × strict/lenient — lenient " +
      "keeps exactly the complete-prefix records, strict throws iff lenient errs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // Adversarial payloads: separator traps, header-looking bytes,
    // non-ASCII (multi-byte UTF-8 straddles cuts), empties.
    val payloadGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(40)),
      Gen.const(""),
      Gen.const("trap\r\n\r\nWARC/1.0\r\nFake: x\r\n\r\n tail"),
      Gen.const("Content-Length: 999"),
      Gen.const("héllo ✓ przykład żółć"),
      Gen.listOfN(25, Gen.choose(32.toChar, 126.toChar)).map(_.mkString))
    val caseGen = for {
      n <- Gen.choose(1, 6)
      ps <- Gen.listOfN(n, payloadGen)
      gzip <- Gen.oneOf(true, false)
      cutFrac <- Gen.choose(0.0, 1.0)
    } yield (ps, gzip, cutFrac)
    val cases = (0 until 120).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(i.toLong)))

    cases.zipWithIndex.foreach { case ((ps, gzip, cutFrac), i) =>
      val recs = ps.zipWithIndex.map { case (p, j) =>
        rec(p.getBytes(UTF_8), "WARC-Type" -> "conversion",
          "WARC-Target-URI" -> s"http://t/$j")
      }
      val plain = recs.flatten.toArray
      // end-of-payload offsets: a cut at or past this point leaves the
      // record complete (EOF inside the \r\n\r\n separator is fine)
      val payloadEnds = recs.scanLeft(0)(_ + _.length).zip(recs)
        .map { case (start, r) => start + r.length - 4 }
      val full = if (gzip) gz(recs: _*) else plain
      val cut = math.max(1, math.min(full.length, (full.length * cutFrac).toInt))
      val truncated = full.take(cut)

      val (kept, err) = Warc.parse(truncated)
      if (!gzip) {
        // PLAIN: exact — record j survives iff the cut covers its
        // payload. One modeled lenience: readLineBytes accepts an
        // EOF-terminated "\r" as a line, so an EMPTY-payload record
        // whose header blank line lost only its final \n is complete
        // one byte before its payload end.
        val expect = payloadEnds.zip(ps).count { case (pe, p) =>
          cut >= (if (p.isEmpty) pe - 1 else pe) }
        assert(kept.size == expect,
          s"case $i: cut=$cut/${full.length} kept=${kept.size} expect=$expect")
      } else {
        // GZIP: the cut member's deflate data may or may not flush its
        // record before the trailer dies — exact below, +1 above.
        val memberEnds = recs.map(r => gz(r).length).scanLeft(0)(_ + _).tail
        val fullMembers = memberEnds.count(_ <= cut)
        assert(kept.size >= fullMembers && kept.size <= fullMembers + 1,
          s"case $i: cut=$cut kept=${kept.size} fullMembers=$fullMembers")
      }
      // whatever survives is the exact PREFIX, byte-equal payloads
      kept.zipWithIndex.foreach { case (r, j) =>
        assert(r.targetUri.contains(s"http://t/$j"), s"case $i: order broke at $j")
        assert(java.util.Arrays.equals(r.payload, ps(j).getBytes(UTF_8)),
          s"case $i: payload $j not byte-equal")
      }
      // strict ⇔ lenient consistency: strict throws exactly when the
      // lenient walk reported a truncation error, else agrees exactly
      if (err.isDefined)
        intercept[Warc.WarcFormatException](Warc.parse(truncated, strict = true))
      else {
        val (strictRecs, strictErr) = Warc.parse(truncated, strict = true)
        assert(strictErr.isEmpty && strictRecs.size == kept.size)
      }
    }
  }

  test("EOF right after the final payload is a complete record") {
    val full = wet("http://e/1", "done")
    val noTrailer = full.dropRight(4) // strip the \r\n\r\n separator
    val (rs, err) = Warc.parse(noTrailer)
    assert(err.isEmpty && rs.size == 1 &&
      new String(rs.head.payload, UTF_8) == "done")
  }

  test("records() emits one row per record; audit() is the triage metric") {
    val ok = Warc.parse(wet("http://d/1", "x"))._1 // warm nothing; clarity only
    assert(ok.size == 1)
    val blobs = Seq(
      (1L, wet("http://d/1", "one") ++ wet("http://d/2", "two")),
      (2L, wet("http://d/3", "three") ++ "garbage tail".getBytes(UTF_8)),
      (3L, "nothing warc here".getBytes(UTF_8))).toDF("id", "blob")
    val rows = Warc.records(blobs, "id", "blob")
      .select($"id", $"rec_idx", $"target_uri",
        $"payload".cast("string").as("text"))
      .as[(Long, Int, String, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows == Seq(
      (1L, 0, "http://d/1", "one"), (1L, 1, "http://d/2", "two"),
      (2L, 0, "http://d/3", "three")))
    val audit = Warc.audit(blobs, "id", "blob")
      .collect().map(a => a.id -> ((a.n_records, a.ok))).toMap
    assert(audit == Map(1L -> ((2, true)), 2L -> ((1, false)),
      3L -> ((0, false))))
  }

  test("gzip-level corruption is a lenient parse error, never an uncaught exception") {
    // truncated mid-member: the inflater throws EOFException, which
    // must surface as the same lenient-stop / strict-throw discipline
    // as a short plain payload
    val whole = gz(wet("http://z/1", "first"), wet("http://z/2", "second"))
    val cut = whole.dropRight(40)
    val (rs, err) = Warc.parse(cut)
    assert(err.exists(_.contains("stream error")), s"got $err (rs=${rs.size})")
    assert(rs.size < 2) // never fabricates the truncated record
    assertThrows[Warc.WarcFormatException](Warc.parse(cut, strict = true))
    // corrupt gzip header: magic bytes followed by garbage
    val badHeader = Array[Byte](0x1f, 0x8b.toByte, 0x77, 0x77, 0x77, 0x77)
    val (rs2, err2) = Warc.parse(badHeader)
    assert(rs2.isEmpty && err2.isDefined)
    assertThrows[Warc.WarcFormatException](Warc.parse(badHeader, strict = true))
    // and the DataFrame ops classify, not crash
    val audit = Warc.audit(Seq((1L, cut), (2L, badHeader)).toDF("id", "blob"),
      "id", "blob").collect().map(a => a.id -> a.ok).toMap
    assert(audit == Map(1L -> false, 2L -> false))
  }

  test("multi-member gzip survives an available()==0 underlying stream") {
    // The InputStream contract allows available()==0 with bytes left;
    // GZIPInputStream then refuses to probe for the next member unless
    // the reader peeks (Warc.PeekAvailable). Without it, this stream
    // yields ONE record and a clean EOF — silent, unauditable loss.
    val bytes = gz(wet("http://m/1", "one")) ++ gz(wet("http://m/2", "two"))
    // available()==0 AND one byte per read(): the single-byte dribble
    // keeps BufferedInputStream's buffer empty at the member trailer,
    // so GZIPInputStream's next-member probe really does hit the
    // available() check instead of finding buffered bytes by luck
    val zeroAvail = new java.io.InputStream {
      private val in = new java.io.ByteArrayInputStream(bytes)
      override def read(): Int = in.read()
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        in.read(b, off, math.min(len, 1))
      override def available(): Int = 0
    }
    val r = new Warc.WarcReader(zeroAvail, strict = true)
    try {
      val uris = Iterator.continually(r.next()).takeWhile(_.isDefined)
        .map(_.get.targetUri.get).toSeq
      assert(uris == Seq("http://m/1", "http://m/2"), uris)
    } finally r.close()
  }

  test("volume: a 20k-record gzip shard streams through in one pass") {
    val out = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(out)
    (0 until 20000).foreach(i => g.write(wet(s"http://v/$i", s"body $i")))
    g.finish()
    val blob = out.toByteArray
    val (rs, err) = Warc.parse(blob)
    assert(err.isEmpty && rs.size == 20000)
    assert(new String(rs(12345).payload, UTF_8) == "body 12345")
    // and through the DataFrame op: one row per record
    val n = Warc.records(Seq((1L, blob)).toDF("id", "blob"), "id", "blob").count()
    assert(n == 20000)
  }

  test("splitHttpResponse: status + mime + exact body bytes; unparseable passes through") {
    val body = Array[Byte](0, 1, 2, -1, 'W', 'A', 'R', 'C') // binary body
    val msg = ("HTTP/1.1 200 OK\r\nServer: t\r\n" +
      "Content-Type: TEXT/HTML; charset=utf-8\r\n\r\n").getBytes(UTF_8) ++ body
    val (st, mime, got) = Warc.splitHttpResponse(msg)
    assert(st == 200 && mime == "text/html" && got.toSeq == body.toSeq)
    // bare-LF heads parse too
    val (st4, mime4, body4) =
      Warc.splitHttpResponse("HTTP/1.0 404 NF\nContent-Type: a/b\n\nx".getBytes(UTF_8))
    assert(st4 == 404 && mime4 == "a/b" && new String(body4, UTF_8) == "x")
    // no blank line / no status line -> (-1, null, whole payload)
    val noSplit = "HTTP/1.1 200 OK\r\nheaders-only".getBytes(UTF_8)
    assert(Warc.splitHttpResponse(noSplit)._1 == -1)
    val notHttp = "<html>直接</html>\r\n\r\nrest".getBytes(UTF_8)
    val (s2, m2, b2) = Warc.splitHttpResponse(notHttp)
    assert(s2 == -1 && m2 == null && b2.toSeq == notHttp.toSeq)
  }

  test("httpResponses keeps only application/http response records and splits them") {
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<p>page one</p>").getBytes(UTF_8)
    val blob =
      rec(http, "WARC-Type" -> "response", "WARC-Target-URI" -> "http://h/1",
        "Content-Type" -> "application/http; msgtype=response") ++
      wet("http://h/2", "a conversion record, skipped") ++
      rec("raw bytes".getBytes(UTF_8), "WARC-Type" -> "response",
        "Content-Type" -> "application/octet-stream") // response but not http
    val out = Warc.httpResponses(Seq((7L, blob)).toDF("id", "blob"),
      "id", "blob").collect().toSeq
    assert(out.map(r => (r.id, r.rec_idx, r.target_uri, r.http_status, r.mime)) ==
      Seq((7L, 0, "http://h/1", 200, "text/html")))
    assert(new String(out.head.body, UTF_8) == "<p>page one</p>")
  }
}
