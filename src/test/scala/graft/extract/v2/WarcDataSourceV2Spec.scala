package graft.extract.v2

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

import graft.SparkSpec
import graft.ops.Warc
import org.apache.spark.sql.functions._

class WarcDataSourceV2Spec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.extract.v2.WarcDataSourceV2"

  private def rec(uri: String, text: String): Array[Byte] = {
    val payload = text.getBytes(UTF_8)
    (s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Type: text/plain\r\nContent-Length: ${payload.length}\r\n\r\n")
      .getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def gzMembers(recs: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    recs.foreach { b =>
      val g = new GZIPOutputStream(out); g.write(b); g.finish()
    }
    out.toByteArray
  }

  /** A dir with one plain .warc (2 records) and one multi-member
    * .warc.gz (2 records), plus a decoy extension that must not load.
    */
  private def shardDir(): Path = {
    val dir = Files.createTempDirectory("warc_v2_")
    Files.write(dir.resolve("a.warc"),
      rec("http://a/1", "alpha") ++ rec("http://a/2", "beta"))
    Files.write(dir.resolve("b.warc.gz"),
      gzMembers(rec("http://b/1", "gamma"), rec("http://b/2", "delta")))
    Files.write(dir.resolve("notes.txt"), "not a shard".getBytes(UTF_8))
    // a DIRECTORY whose name matches the extension must not be opened
    Files.createDirectory(dir.resolve("decoy.warc"))
    dir
  }

  test("reads a directory of shards: file-per-partition, gzip transparent, extension-filtered") {
    val dir = shardDir()
    val df = spark.read.format(Fmt).option("path", dir.toString).load()
    assert(df.schema == WarcDataSourceV2.Schema)
    val rows = df.select($"file", $"rec_idx", $"target_uri",
        $"content_length", $"payload".cast("string").as("text"))
      .as[(String, Int, String, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(rows.map(r => (r._3, r._5)).toSeq == Seq(
      ("http://a/1", "alpha"), ("http://a/2", "beta"),
      ("http://b/1", "gamma"), ("http://b/2", "delta")))
    assert(rows.forall(r => r._4 == r._5.length)) // ASCII: bytes == chars
    // one partition per shard file
    assert(df.rdd.getNumPartitions == 2)
  }

  test("payload pruning: a metadata-only query reads without materializing bodies") {
    val dir = shardDir()
    val meta = spark.read.format(Fmt).option("path", dir.toString).load()
      .groupBy($"warc_type").agg(count(lit(1)).as("n"),
        sum($"content_length").as("bytes"))
    // the scan's readSchema must have been pruned to the 2 used columns
    val scan = meta.queryExecution.executedPlan.toString
    assert(scan.contains("warc_type") && !scan.contains("payload"),
      s"payload survived pruning:\n$scan")
    val got = meta.as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("conversion", 4L,
      ("alpha".length + "beta".length + "gamma".length + "delta".length).toLong)))
  }

  test("strict=false (default) keeps a truncated shard's good prefix; strict=true fails the task") {
    val dir = Files.createTempDirectory("warc_trunc_")
    Files.write(dir.resolve("t.warc"),
      rec("http://t/1", "whole") ++
        "WARC/1.0\r\nContent-Length: 9999\r\n\r\nshort".getBytes(UTF_8))
    val lenient = spark.read.format(Fmt).option("path", dir.toString).load()
    assert(lenient.select($"target_uri").as[String].collect().toSeq ==
      Seq("http://t/1"))
    val strict = spark.read.format(Fmt).option("path", dir.toString)
      .option("strict", "true").load()
    val e = intercept[org.apache.spark.SparkException](strict.count())
    val cause = Option(e.getCause).map(_.toString).getOrElse(e.toString)
    assert(cause.contains("t.warc") && cause.contains("record 1"), cause)
  }

  test("a single-file path loads that file; a missing path fails with the path in the message") {
    val dir = shardDir()
    val one = spark.read.format(Fmt)
      .option("path", dir.resolve("b.warc.gz").toString).load()
    assert(one.count() == 2)
    val e = intercept[Exception](spark.read.format(Fmt)
      .option("path", dir.resolve("absent.warc").toString).load().count())
    assert(e.toString.contains("absent.warc"))
  }

  test("round-trips with the blob-level parser: same records either way") {
    val dir = shardDir()
    val viaSource = spark.read.format(Fmt).option("path", dir.toString).load()
      .select($"target_uri", $"payload".cast("string").as("text"))
      .as[(String, String)].collect().sorted.toSeq
    val blobs = Seq(
      (0L, Files.readAllBytes(dir.resolve("a.warc"))),
      (1L, Files.readAllBytes(dir.resolve("b.warc.gz")))).toDF("id", "blob")
    val viaBlob = Warc.records(blobs, "id", "blob")
      .select($"target_uri", $"payload".cast("string").as("text"))
      .as[(String, String)].collect().sorted.toSeq
    assert(viaSource == viaBlob && viaSource.size == 4)
  }
}
