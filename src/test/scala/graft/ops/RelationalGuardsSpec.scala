package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input and determinism guards for the relational analytic
  * ops (review-driven: each test pins a fixed silent-wrong-output or
  * job-crash hazard).
  */
class RelationalGuardsSpec extends SparkSpec {
  import spark.implicits._

  test("BloomJoin rejects non-integral keys instead of silently dropping matches") {
    // string keys: the builder hashes UTF8 bytes, the probe hashes the
    // cast long — disjoint inputs, ~all matching rows lost at the fpp
    val dim = Seq("1", "2").toDF("k")
    val fact = Seq(("1", "a"), ("2", "b")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.pruneLarge(fact, "k", dim, "k", 10)
    }
    assert(e.getMessage.contains("integral"))
    // integral keys still work and lose nothing
    val dimL = Seq(1L, 2L).toDF("k")
    val factL = Seq((1L, "a"), (2L, "b"), (99L, "c")).toDF("k", "v")
    val kept = BloomJoin.pruneLarge(factL, "k", dimL, "k", 10)
      .select("k").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(2L))
  }

  test("saltedJoin: deterministic salt, reserved __salt guard, equals plain join") {
    val left = spark.range(1000).select((col("id") % 3).as("k"), col("id").as("v"))
    val right = Seq((0L, "x"), (1L, "y")).toDF("k", "w")
    val salted = SkewJoin.saltedJoin(left, right, "k", "k", 4, "left")
    val plain = left.join(right, Seq("k"), "left")
    assert(salted.count() === plain.count())
    assert(salted.select(sum("v")).head.getLong(0) === plain.select(sum("v")).head.getLong(0))
    // same plan → same salts on re-execution (row-content hash, not
    // monotonically_increasing_id): two runs agree exactly
    assert(salted.collect().toSet === salted.collect().toSet)
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(left.withColumn("__salt", lit(1)), right, "k", "k", 4)
    }
    assert(e.getMessage.contains("__salt"))
  }

  test("topKPerGroup: NaN ranks first (Spark desc semantics), null orders excluded") {
    val df = Seq(
      ("g", Some(1.0), 1L), ("g", Some(Double.NaN), 2L),
      ("g", None, 3L), ("g", Some(5.0), 4L)).toDF("grp", "v", "t")
    val out = TopK.topKPerGroup(df, "grp", "v", "t", 2)
      .select("rank", "t").as[(Long, Long)].collect().toMap
    // window desc puts NaN first, then 5.0; the null row neither
    // crashes the encoder nor takes a slot
    assert(out === Map(1L -> 2L, 2L -> 4L))
  }

  test("funnel DateType hop bound is timezone-independent across DST") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      // 2025-11-02 -> 2025-11-03 spans the US fall-back: 90000 wall
      // seconds. unix_timestamp math would reject the one-day hop.
      val events = Seq(
        ("u1", "a", java.sql.Date.valueOf("2025-11-02")),
        ("u1", "b", java.sql.Date.valueOf("2025-11-03"))).toDF("k", "typ", "d")
      val out = Funnel.funnel(events, "k", "typ", "d", Seq("a", "b"),
        withinSeconds = Some(86400L))
      assert(out.select("depth").as[Long].head() === 2L,
        "a one-day hop on dates must pass a 86400s bound in any timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("retention cohorts floor pre-epoch timestamps (no collapse across 1970)") {
    val events = Seq(
      ("u1", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(-60))),
      ("u1", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(30)))
    ).toDF("user_id", "ts")
    val out = Funnel.retention(events, "user_id", "ts", periodSeconds = 100L)
      .select("cohort", "period_offset").as[(Long, Long)].collect().toSet
    // -60s floors to period -1 (DIV toward zero would give 0 and merge
    // both events into one cohort cell); +30s is period 0 → offset 1
    assert(out === Set((-1L, 0L), (-1L, 1L)))
  }

  test("sessionize guards its OUTPUT column, not a phantom temp name") {
    val df = Seq(("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
      .toDF("k", "ts", "t")
    val e = intercept[IllegalArgumentException] {
      Sessionize.sessionize(df.withColumn("session_idx", lit(9L)), "k", "ts", "t", 1000L)
    }
    assert(e.getMessage.contains("session_idx"))
    // a user column named __sess_us (never materialized internally) is fine
    val ok = Sessionize.sessionize(df.withColumn("__sess_us", lit("keep")),
      "k", "ts", "t", 1000L)
    assert(ok.select("__sess_us").as[String].head() === "keep")
  }

  test("snapshotDiff digest is injection-proof across column boundaries") {
    // ("x", "") vs ("x", "") concat identically under a
    // separator digest; per-column digests must classify as changed
    val o = Seq((1L, "x", "")).toDF("id", "a", "b")
    val n = Seq((1L, "x", "")).toDF("id", "a", "b")
    val st = Changelog.snapshotDiff(o, n, "id", Seq("a", "b"))
      .select("status").as[String].head()
    assert(st === "changed")
  }

  test("snapshotDiff digests complex and binary columns exactly, not via lossy string casts") {
    // Array("a, b") vs Array("a", "b") both render "[a, b]" under a
    // string cast — a changed row would classify "unchanged"
    val o = Seq((1L, Seq("a, b"))).toDF("id", "tags")
    val n = Seq((1L, Seq("a", "b"))).toDF("id", "tags")
    assert(Changelog.snapshotDiff(o, n, "id", Seq("tags"))
      .select("status").as[String].head() === "changed")
    // binary content diffs byte-exactly
    val ob = Seq((1L, Array[Byte](1, 2))).toDF("id", "payload")
    val nb = Seq((1L, Array[Byte](1, 3))).toDF("id", "payload")
    assert(Changelog.snapshotDiff(ob, nb, "id", Seq("payload"))
      .select("status").as[String].head() === "changed")
    // typo'd content column fails eagerly with the column name
    val e = intercept[IllegalArgumentException](
      Changelog.snapshotDiff(ob, nb, "id", Seq("payloda")))
    assert(e.getMessage.contains("payloda"))
  }

  test("changelog compact fails loudly on a null sequence instead of dropping the event") {
    // max_by skips null orderings: a null-seq DELETE would be silently
    // dropped and an all-null-seq id would emit a phantom row
    val log = Seq((7L, java.lang.Long.valueOf(1L), "U", "x"),
        (7L, null.asInstanceOf[java.lang.Long], "D", null))
      .toDF("id", "seq", "op", "v")
    val e = intercept[Exception](
      Changelog.compact(log, "id", "seq", "op", Seq("v")).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("null seq")), msgs(e).mkString(" | "))
  }

  test("sessionize excludes null timestamps instead of minting phantom sessions") {
    val df = Seq(
      ("u", Some("2024-01-01 10:00:00"), 1L),
      ("u", None, 2L), // no place on the timeline
      ("u", Some("2024-01-01 10:05:00"), 3L))
      .toDF("k", "s", "t").withColumn("ts", col("s").cast("timestamp")).drop("s")
    val out = Sessionize.sessionize(df, "k", "ts", "t", 30L * 60 * 1000000)
      .select("t", "session_idx").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 3L -> 1L)) // one real session, no phantoms
  }

  test("splitJoin keeps plain-join identity when the sides share a non-key column name") {
    val left = Seq((1L, "l1"), (2L, "l2"), (2L, "l2b")).toDF("k", "v")
    val right = Seq((1L, "r1"), (2L, "r2")).toDF("k", "v")
    val hot = SkewJoin.reconHotKeys(left, Seq("k"), 1)
    val got = SkewJoin.splitJoin(left, right, Seq("k"), hot)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = left.join(right, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === want)
  }

  test("saltedJoin tolerates map-typed payload columns (hash() rejects maps)") {
    val left = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .withColumn("attrs", map(lit("x"), lit("y")))
    val right = Seq((1L, "R1"), (2L, "R2")).toDF("rk", "w")
    val out = SkewJoin.saltedJoin(left, right, "k", "rk", saltBuckets = 4)
      .select("k", "v", "w").as[(Long, String, String)].collect().toSet
    assert(out === Set((1L, "a", "R1"), (2L, "b", "R2")))
  }

  test("exact percentiles reject non-numeric value columns eagerly") {
    val df = Seq(("g", "9"), ("g", "10"), ("g", "50")).toDF("grp", "v")
    val e = intercept[IllegalArgumentException] {
      Percentiles.exactDiscrete(df, "grp", "v", Seq("v"), Seq(("p50", 0.5)))
    }
    assert(e.getMessage.contains("numeric"))
    intercept[IllegalArgumentException] {
      Percentiles.autoDiscrete(df, "grp", "v", Seq("v"), Seq(("p50", 0.5)))
    }
  }
}
