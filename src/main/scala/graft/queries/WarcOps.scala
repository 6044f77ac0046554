package graft.queries

import java.nio.charset.{Charset, StandardCharsets}

import graft.Tables
import graft.ops.{Html, Mojibake, Warc}
import org.apache.spark.sql.functions._

/** Harness entries for the crawl-ingestion surface ([[graft.ops.Warc]]).
  *
  * Both entries SYNTHESIZE multi-record WARC blobs in-plan: each doc
  * becomes one record (headers + Content-Length in BYTES + payload),
  * records group-concatenate into `doc_id % 40` shard blobs in
  * doc_id order, and the parser must walk the records back out. The
  * oracles derive the expected output from doc attributes alone —
  * byte math included (`strlen` vs `octet_length`) — so a parser that
  * miscounts a single byte, mis-folds a header, or splits a record at
  * the wrong boundary breaks the hash.
  */
object WarcOps {
  import Catalog.{Entry, Q}

  /** Group-concatenate per-doc record strings into shard blobs,
    * doc_id-ordered within each shard: (g, blob).
    */
  private def shardBlobs(docs: org.apache.spark.sql.DataFrame,
      recCol: org.apache.spark.sql.Column) =
    docs.select(pmod(col("doc_id"), lit(40)).as("g"),
        struct(col("doc_id"), recCol.as("rec")).as("s"))
      .groupBy(col("g"))
      .agg(array_join(transform(array_sort(collect_list(col("s"))),
        x => x.getField("rec")), "").as("blob"))

  // ---- warc_wet_extract: WET (conversion) records round-trip — the
  // Common Crawl extracted-text shard shape. Output is the parsed
  // header URI, the parser's byte count, and the payload decoded back
  // to text; the oracle recomputes all three from the table.
  private val wetExtract: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val uri = concat(lit("http://synth.example/doc/"),
      col("doc_id").cast("string"))
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Record-ID: <urn:synth:"), col("doc_id").cast("string"),
      lit(">\r\nContent-Type: text/plain\r\nContent-Length: "),
      octet_length(col("text")).cast("string"),
      lit("\r\n\r\n"), col("text"), lit("\r\n\r\n"))
    Warc.records(shardBlobs(docs, rec), "g", "blob")
      .select(col("target_uri"), col("content_length"),
        col("payload").cast("string").as("text"))
  }
  private val wetExtractSql =
    """SELECT 'http://synth.example/doc/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       CAST(strlen(text) AS BIGINT) AS content_length, text
      |FROM documents""".stripMargin

  /** Mojibake suffixes for the intake pipeline, keyed by doc_id % 4
    * (branch 3 stays clean). Every char's UTF-8 byte image avoids the
    * five cp1252-undefined bytes, so the corruption is invertible.
    * Shared with the pretrain-corpus capstone, whose oracle replays
    * the same suffix CASE.
    */
  private[queries] val intakePhrases = Seq("café", "Grüße", "€9 “ok„")

  // ---- pipeline_warc_intake: the raw-crawl intake pipeline under ONE
  // hash — response records parse out of shard blobs, the HTTP message
  // splits (status gate + mime gate), the HTML page strips to visible
  // text through every stripper trap, and the cp1252 mojibake repairs.
  // Non-ASCII suffixes make the WARC Content-Length differ from the
  // char count, so byte-exact record walking is load-bearing here too.
  private val intake: Q = (s, dir) =>
    intakeResponses(Tables.load(s, dir, "documents"))
      .select(col("target_uri"),
        Mojibake.fixMojibake(
          Html.extractText(col("body").cast("string"))).as("clean"))

  /** The raw-crawl intake stage over an arbitrary (doc_id, text) frame
    * — synthesizes the per-doc WARC response records, walks them back
    * out byte-exactly, and applies the status + mime gates. Reused by
    * the pretrain-corpus capstone so the intake semantics are defined
    * ONCE.
    */
  private[queries] def intakeResponses(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cp1252 = Charset.forName("windows-1252")
    val g = pmod(col("doc_id"), lit(4))
    val suffix = intakePhrases.zipWithIndex.foldLeft(lit(" plain")) {
      case (acc, (p, i)) =>
        when(g === i,
          lit(" " + new String(p.getBytes(StandardCharsets.UTF_8), cp1252)))
          .otherwise(acc)
    }
    val uri = concat(lit("http://crawl.example/doc/"),
      col("doc_id").cast("string"))
    val page = concat(
      lit("<html><head><script>if(a<2){t=\"</p>\";}</script></head>"),
      lit("<body data-x=\"a>b\"><!-- <b>hidden</b> --><p>"),
      col("text"), suffix, lit("</p></body></html>"))
    val http = concat(
      lit("HTTP/1.1 200 OK\r\nServer: synth\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"),
      page)
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
      lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
      octet_length(http).cast("string"), lit("\r\n\r\n"), http, lit("\r\n\r\n"))
    Warc.httpResponses(shardBlobs(docs, rec), "g", "blob")
      .toDF()
      .filter(col("http_status") === 200 && col("mime") === "text/html")
  }

  /** [[intakeResponses]] keyed back to doc_id with the stripped +
    * repaired text — the composed-pipeline entry point: (doc_id, clean).
    */
  private[queries] def intakeCleanDocs(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    intakeResponses(docs).select(
      element_at(split(col("target_uri"), "/"), -1).cast("long").as("doc_id"),
      Mojibake.fixMojibake(
        Html.extractText(col("body").cast("string"))).as("clean"))
  private val intakeSql = {
    val cases = intakePhrases.zipWithIndex
      .map { case (p, i) => s"WHEN $i THEN ' ${p.replace("'", "''")}'" }
      .mkString(" ")
    s"""SELECT 'http://crawl.example/doc/' || CAST(doc_id AS VARCHAR)
       |         AS target_uri,
       |       text || (CASE doc_id % 4 $cases ELSE ' plain' END) AS clean
       |FROM documents""".stripMargin
  }

  def entries: Seq[Entry] = Seq(
    Entry("warc_wet_extract", wetExtract, Some(wetExtractSql)),
    Entry("pipeline_warc_intake", intake, Some(intakeSql)),
  )
}
