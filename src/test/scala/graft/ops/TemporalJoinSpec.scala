package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  // Left: probes at epoch seconds; right: (key, ts, tag, value) facts.
  private def leftDf = Seq(
    (1L, 100L, "a"), (1L, 200L, "b"), (1L, 50L, "c"),
    (2L, 100L, "d"), (3L, 100L, "e"))
    .toDF("k", "t", "probe")
  private def rightDf = Seq(
    (1L, 100L, "r1", 1.0), (1L, 150L, "r2", 2.0),
    (2L, 101L, "r3", 3.0))
    .toDF("k", "rt", "tag", "v")

  test("asof backward: most recent at-or-before per key, inclusive at equal ts, null when none") {
    val out = TemporalJoin.asofBackward(leftDf, rightDf,
        keys = Seq("k"), leftTime = "t", rightTime = "rt",
        payload = Seq("tag", "v"))
      .select("k", "t", "probe", "tag", "v")
      .as[(Long, Long, String, Option[String], Option[Double])]
      .collect().toSet
    assert(out === Set(
      (1L, 100L, "a", Some("r1"), Some(1.0)), // inclusive: rt == t matches
      (1L, 200L, "b", Some("r2"), Some(2.0)), // most recent, not first
      (1L, 50L, "c", None, None),             // nothing at-or-before
      (2L, 100L, "d", None, None),            // right row is 1s later
      (3L, 100L, "e", None, None)))           // key absent on right
  }

  test("asof tolerance: matches staler than the bound are nulled, fresher kept") {
    val out = TemporalJoin.asofBackward(leftDf, rightDf,
        keys = Seq("k"), leftTime = "t", rightTime = "rt",
        payload = Seq("tag"), tolerance = Some(60L))
      .select("k", "t", "tag").as[(Long, Long, Option[String])].collect().toSet
    assert(out.contains((1L, 200L, Some("r2"))), "within 60s: kept")
    assert(out.contains((1L, 100L, Some("r1"))), "0s staleness: kept")
    // a probe 120s after r2 with tolerance 60 must null out
    val far = Seq((1L, 270L, "z")).toDF("k", "t", "probe")
    val tol = TemporalJoin.asofBackward(far, rightDf,
        keys = Seq("k"), leftTime = "t", rightTime = "rt",
        payload = Seq("tag"), tolerance = Some(60L))
      .select("tag").as[Option[String]].head()
    assert(tol.isEmpty)
  }

  test("asof: empty right side leaves every left row with null payload") {
    val out = TemporalJoin.asofBackward(leftDf, rightDf.filter(lit(false)),
        keys = Seq("k"), leftTime = "t", rightTime = "rt", payload = Seq("tag"))
    assert(out.count() === leftDf.count())
    assert(out.filter(col("tag").isNotNull).count() === 0)
  }

  test("asof: a null payload VALUE on the winning row is kept (not skipped for an older row)") {
    val right = Seq(
      (1L, 100L, Some("old"), 1.0),
      (1L, 150L, None: Option[String], 2.0)) // winner for t>=150, tag legitimately null
      .toDF("k", "rt", "tag", "v")
    val probe = Seq((1L, 160L, "p")).toDF("k", "t", "probe")
    val row = TemporalJoin.asofBackward(probe, right,
        keys = Seq("k"), leftTime = "t", rightTime = "rt", payload = Seq("tag", "v"))
      .select("tag", "v").as[(Option[String], Option[Double])].head()
    assert(row === ((None, Some(2.0))), "winning row's null tag must survive; v proves row identity")
  }

  test("asof: timestamp time columns work end-to-end (not just numeric epochs)") {
    val l = Seq(("u1", "2024-01-02 00:00:00", "p1")).toDF("k", "ts", "probe")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = Seq(("u1", "2024-01-01 00:00:00", 7.0)).toDF("k", "rts", "v")
      .withColumn("rts", to_timestamp(col("rts")))
    val out = TemporalJoin.asofBackward(l, r, Seq("k"), "ts", "rts", Seq("v"),
      tolerance = Some(2 * 86400L))
    assert(out.select("v").as[Option[Double]].head() === Some(7.0))
  }

  test("asof: reserved and colliding names are rejected eagerly") {
    val badLeft = leftDf.withColumn("__asof_row", lit(1))
    assertThrows[IllegalArgumentException] {
      TemporalJoin.asofBackward(badLeft, rightDf, Seq("k"), "t", "rt", Seq("tag"))
    }
    // payload column name already present on the left
    val clash = rightDf.withColumnRenamed("tag", "probe")
    assertThrows[IllegalArgumentException] {
      TemporalJoin.asofBackward(leftDf, clash, Seq("k"), "t", "rt", Seq("probe"))
    }
    // missing column
    assertThrows[IllegalArgumentException] {
      TemporalJoin.asofBackward(leftDf, rightDf, Seq("k"), "t", "rt", Seq("nope"))
    }
  }

  test("asof: mixed time-type classes and nearest-pass reserved names are rejected eagerly") {
    val strTime = rightDf.withColumn("rt", col("rt").cast("string"))
    assertThrows[IllegalArgumentException] {
      TemporalJoin.asofBackward(leftDf, strTime, Seq("k"), "t", "rt", Seq("tag"))
    }
    val bwdCol = leftDf.withColumn("__asof_bwd", lit(1))
    assertThrows[IllegalArgumentException] {
      TemporalJoin.asofNearest(bwdCol, rightDf, Seq("k"), "t", "rt", Seq("tag"))
    }
  }

  test("asof: unsupported time type fails loudly when tolerance needs epoch math") {
    val l = leftDf.withColumn("arr", array(lit(1)))
    assertThrows[IllegalArgumentException] {
      TemporalJoin.asofBackward(l, rightDf, Seq("k"), "arr", "rt", Seq("tag"),
        tolerance = Some(1L))
    }
  }

  // ---- range join -------------------------------------------------

  private def intervalsDf = Seq(
    (1L, 100L, 200L, "i1"), (1L, 150L, 250L, "i2"), (2L, 0L, 1000L, "i3"))
    .toDF("k", "s", "e", "iid")
  private def pointsDf = Seq(
    (1L, 100L, "p_at_start"),  // == start: excluded (half-open)
    (1L, 200L, "p_at_end"),    // == end of i1: included; inside i2
    (1L, 160L, "p_inside"),    // inside both i1 and i2
    (1L, 300L, "p_outside"),
    (2L, 500L, "p_other_key"),
    (3L, 150L, "p_no_interval"))
    .toDF("k", "t", "pid")

  test("range join: half-open containment, per-key, each pair exactly once") {
    val out = TemporalJoin.pointsInIntervals(intervalsDf, pointsDf,
        keys = Seq("k"), startCol = "s", endCol = "e", timeCol = "t", binSeconds = 100L)
      .select("iid", "pid").as[(String, String)].collect().toList
    assert(out.size === out.distinct.size, "no duplicate pairs")
    assert(out.toSet === Set(
      ("i1", "p_at_end"), ("i2", "p_at_end"),
      ("i1", "p_inside"), ("i2", "p_inside"),
      ("i3", "p_other_key")))
  }

  test("range join: result is bin-width invariant (explosion factor changes, answer doesn't)") {
    def run(bin: Long) = TemporalJoin.pointsInIntervals(intervalsDf, pointsDf,
        keys = Seq("k"), startCol = "s", endCol = "e", timeCol = "t", binSeconds = bin)
      .select("iid", "pid").as[(String, String)].collect().toSet
    val wide = run(10000L) // every interval in ~1 bucket
    val narrow = run(7L)   // i3 alone explodes over ~143 buckets
    assert(wide === narrow)
    assert(wide.size === 5)
  }

  test("range join: reserved and shared column names are rejected eagerly") {
    assertThrows[IllegalArgumentException] {
      TemporalJoin.pointsInIntervals(intervalsDf.withColumn("__bin", lit(1)), pointsDf,
        Seq("k"), "s", "e", "t", 100L)
    }
    assertThrows[IllegalArgumentException] {
      TemporalJoin.pointsInIntervals(intervalsDf, pointsDf.withColumnRenamed("pid", "iid"),
        Seq("k"), "s", "e", "t", 100L)
    }
    assertThrows[IllegalArgumentException] {
      TemporalJoin.pointsInIntervals(intervalsDf, pointsDf, Seq("k"), "s", "e", "t", 0L)
    }
  }

  test("asof forward: earliest at-or-after, inclusive, tolerance bounds the future") {
    val out = TemporalJoin.asofForward(leftDf, rightDf,
        keys = Seq("k"), leftTime = "t", rightTime = "rt", payload = Seq("tag"))
      .select("k", "t", "tag").as[(Long, Long, Option[String])].collect().toSet
    assert(out === Set(
      (1L, 100L, Some("r1")),  // inclusive at equal ts
      (1L, 200L, None),        // nothing at-or-after 200
      (1L, 50L, Some("r1")),   // earliest >= 50 is r1@100, not r2@150
      (2L, 100L, Some("r3")),
      (3L, 100L, None)))
    val tol = TemporalJoin.asofForward(leftDf, rightDf,
        keys = Seq("k"), leftTime = "t", rightTime = "rt", payload = Seq("tag"),
        tolerance = Some(10L))
      .select("k", "t", "tag").as[(Long, Long, Option[String])].collect().toSet
    assert(tol.contains((1L, 50L, None)), "r1 is 50s in the future, beyond tolerance 10")
    assert(tol.contains((2L, 100L, Some("r3"))), "1s in the future, within tolerance")
  }

  test("asof nearest: minimal |distance|, ties prefer the backward candidate") {
    // k=1: probe 120 → r1@100 (d=20) beats r2@150 (d=30); probe 130 →
    // r2@150 (d=20) beats r1@100 (d=30); probe 125 → tie (25/25) → r1.
    val probes = Seq((1L, 120L, "a"), (1L, 130L, "b"), (1L, 125L, "tie"),
      (3L, 100L, "none")).toDF("k", "t", "probe")
    val out = TemporalJoin.asofNearest(probes, rightDf,
        keys = Seq("k"), leftTime = "t", rightTime = "rt", payload = Seq("tag"))
      .select("probe", "tag").as[(String, Option[String])].collect().toMap
    assert(out === Map(
      "a" -> Some("r1"), "b" -> Some("r2"), "tie" -> Some("r1"), "none" -> None))
    // tolerance kills both directions when neither is close enough
    val tol = TemporalJoin.asofNearest(probes, rightDf,
        keys = Seq("k"), leftTime = "t", rightTime = "rt", payload = Seq("tag"),
        tolerance = Some(5L))
      .select("probe", "tag").as[(String, Option[String])].collect().toMap
    assert(tol("a").isEmpty && tol("b").isEmpty && tol("tie").isEmpty)
  }

  test("salted asof == plain asof on adversarial data (hot key, slice boundaries, ties)") {
    import scala.util.Random
    val rnd = new Random(7)
    // key 1 is hot (many rows, many slices); keys 2-4 sparse; right
    // timestamps collide with left ones and with slice edges.
    val lrows = (1 to 2000).map { i =>
      val k = if (i % 4 == 0) 1L + rnd.nextInt(4) else 1L
      (k, rnd.nextInt(5000).toLong, s"p$i")
    }
    val rrows = (1 to 600).map { i =>
      val k = if (i % 4 == 0) 1L + rnd.nextInt(4) else 1L
      (k, i * 7L % 5000, s"r$i", rnd.nextDouble())
    }.distinctBy(r => (r._1, r._2)) // unique per (key, ts)
    val l = lrows.toDF("k", "t", "probe")
    val r = rrows.toDF("k", "rt", "tag", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "t", "probe", "tag", "v")
        .as[(Long, Long, String, Option[String], Option[Double])].collect().sorted.toList
    val plain = canon(TemporalJoin.asofBackward(l, r, Seq("k"), "t", "rt", Seq("tag", "v")))
    // slice width 100 → hot key spreads over ~50 slices; also an
    // extreme width-1 slicing (every ts its own slice)
    for (slice <- Seq(100L, 1L, 100000L)) {
      val salted = canon(TemporalJoin.asofBackwardSalted(
        l, r, Seq("k"), "t", "rt", Seq("tag", "v"), sliceSeconds = slice))
      assert(salted === plain, s"sliceSeconds=$slice diverged")
    }
    // and with tolerance
    val plainTol = canon(TemporalJoin.asofBackward(l, r, Seq("k"), "t", "rt",
      Seq("tag", "v"), tolerance = Some(200L)))
    val saltedTol = canon(TemporalJoin.asofBackwardSalted(l, r, Seq("k"), "t", "rt",
      Seq("tag", "v"), sliceSeconds = 100L, tolerance = Some(200L)))
    assert(saltedTol === plainTol)
  }

  test("salted asof: carry crosses empty slices; local pass respects within-slice order") {
    val l = Seq((1L, 5L, "before"), (1L, 950L, "far_later"), (1L, 902L, "early_in_slice"))
      .toDF("k", "t", "probe")
    val r = Seq((1L, 10L, "r_early"), (1L, 920L, "r_late")).toDF("k", "rt", "tag")
    val out = TemporalJoin.asofBackwardSalted(l, r, Seq("k"), "t", "rt", Seq("tag"),
        sliceSeconds = 100L)
      .select("probe", "tag").as[(String, Option[String])].collect().toMap
    assert(out("before") === None)                 // t=5 precedes first right row
    assert(out("early_in_slice") === Some("r_early")) // r_late is in SAME slice but later
    assert(out("far_later") === Some("r_late"))    // carry + local across 8 empty slices
  }

  test("interval overlap: closed-interval matrix, exactly-once, invalid intervals match nothing") {
    val as = Seq(
      (1L, 100L, 200L, "a1"),
      (1L, 300L, 300L, "a_pointlike"),
      (1L, 500L, 400L, "a_invalid"),  // end < start: empty
      (2L, 0L, 50L, "a_other"))
      .toDF("k", "as_", "ae", "aid")
    val bs = Seq(
      (1L, 200L, 250L, "b_touch"),     // touches a1 at 200 → counts (closed)
      (1L, 150L, 160L, "b_nested"),    // inside a1
      (1L, 50L, 99L, "b_before"),      // disjoint
      (1L, 250L, 350L, "b_span"),      // covers a_pointlike
      (1L, 390L, 600L, "b_vs_invalid"),// would overlap a_invalid if it were valid
      (3L, 100L, 200L, "b_other_key"))
      .toDF("k", "bs_", "be", "bid")
    def run(bin: Long) = TemporalJoin.intervalsOverlap(as, bs,
        keys = Seq("k"), aStart = "as_", aEnd = "ae", bStart = "bs_", bEnd = "be",
        binSeconds = bin)
      .select("aid", "bid").as[(String, String)].collect().toList
    val out = run(100L)
    assert(out.size === out.distinct.size, "each pair exactly once")
    assert(out.toSet === Set(
      ("a1", "b_touch"), ("a1", "b_nested"), ("a_pointlike", "b_span")))
    // bin-width invariance: tiny bins multiply exploded rows, not pairs
    assert(run(7L).toSet === out.toSet)
    assert(run(100000L).toSet === out.toSet)
  }

  test("interval overlap plan: equi-join on (key, bin), never nested-loop") {
    val as = Seq((1L, 0L, 10L, "a")).toDF("k", "as_", "ae", "aid")
    val bs = Seq((1L, 5L, 15L, "b")).toDF("k", "bs_", "be", "bid")
    val out = TemporalJoin.intervalsOverlap(as, bs, Seq("k"), "as_", "ae", "bs_", "be", 10L)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") && !physical.contains("CartesianProduct"),
      s"overlap join must stay an equi-join:\n$physical")
  }

  test("multi-key: asof and range join group by the full composite key") {
    val l = Seq((1L, "x", 100L, "p1"), (1L, "y", 100L, "p2"), (2L, "x", 100L, "p3"))
      .toDF("k1", "k2", "t", "probe")
    val r = Seq((1L, "x", 90L, "rx"), (1L, "y", 95L, "ry"), (2L, "z", 80L, "rz"))
      .toDF("k1", "k2", "rt", "tag")
    val asof = TemporalJoin.asofBackward(l, r, Seq("k1", "k2"), "t", "rt", Seq("tag"))
      .select("probe", "tag").as[(String, Option[String])].collect().toMap
    assert(asof === Map("p1" -> Some("rx"), "p2" -> Some("ry"), "p3" -> None))

    val ivs = Seq((1L, "x", 50L, 150L, "i1"), (1L, "y", 50L, 150L, "i2"))
      .toDF("k1", "k2", "s", "e", "iid")
    val pts = Seq((1L, "x", 100L, "q1"), (1L, "z", 100L, "q2"))
      .toDF("k1", "k2", "t", "pid")
    val rng = TemporalJoin.pointsInIntervals(ivs, pts, Seq("k1", "k2"), "s", "e", "t", 100L)
      .select("iid", "pid").as[(String, String)].collect().toSet
    assert(rng === Set(("i1", "q1")), "k2 must participate in the join key")
  }

  test("salted asof at volume: one hot key with 300k rows, bounded slices, equals plain") {
    import org.apache.spark.sql.functions.{col => c, _}
    // one pathological key: 250k left probes + 50k right facts
    val spark0 = spark
    import spark0.implicits._
    val left = spark.range(250000)
      .select(lit(1L).as("k"), (c("id") * 7 % 1000000).as("t"), c("id").as("probe"))
    val right = spark.range(50000)
      .select(lit(1L).as("k"), (c("id") * 37 % 1000000).as("rt"), c("id").as("tag"))
      .dropDuplicates("k", "rt")
    val plain = TemporalJoin.asofBackward(left, right, Seq("k"), "t", "rt", Seq("tag"))
      .agg(sum(c("tag")), count(c("tag")), sum(c("probe"))).as[(Long, Long, Long)].head()
    val salted = TemporalJoin.asofBackwardSalted(left, right, Seq("k"), "t", "rt", Seq("tag"),
        sliceSeconds = 10000L) // 100 slices over the 1e6 time range
      .agg(sum(c("tag")), count(c("tag")), sum(c("probe"))).as[(Long, Long, Long)].head()
    assert(salted === plain)
  }

  test("asof plan: single hash-partition window, no join operator") {
    val out = TemporalJoin.asofBackward(leftDf, rightDf,
      keys = Seq("k"), leftTime = "t", rightTime = "rt", payload = Seq("tag"))
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("Join"), s"merge-asof must not contain a join node:\n$physical")
    assert(physical.contains("Window"), "expected a window operator")
  }

  test("range join plan: hash join on (key, bin), never nested-loop") {
    val out = TemporalJoin.pointsInIntervals(intervalsDf, pointsDf,
      keys = Seq("k"), startCol = "s", endCol = "e", timeCol = "t", binSeconds = 100L)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") && !physical.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$physical")
  }

  test("asof: null-time right rows never match; null-time left rows stay unmatched") {
    // A null-ts right row would sort first under asc-nulls-first and
    // become a universal backward match the tolerance filter cannot
    // null out (null staleness falls through when() to "keep").
    val l = Seq((1L, Some(100L), "a"), (1L, None, "b"))
      .toDF("k", "t", "probe")
    val r = Seq((1L, Option.empty[Long], "poison", 99.0), (1L, Some(90L), "ok", 1.0))
      .toDF("k", "rt", "tag", "v")
    for (tol <- Seq(None, Some(1000L))) {
      val bwd = TemporalJoin.asofBackward(l, r, Seq("k"), "t", "rt",
          Seq("tag", "v"), tolerance = tol)
        .select("probe", "tag").as[(String, Option[String])].collect().toMap
      assert(bwd("a") === Some("ok"), s"tol=$tol: real match expected")
      assert(bwd("b") === None, s"tol=$tol: null-time left row must stay unmatched")
      val fwd = TemporalJoin.asofForward(l, r, Seq("k"), "t", "rt",
          Seq("tag", "v"), tolerance = tol)
        .select("probe", "tag").as[(String, Option[String])].collect().toMap
      assert(fwd("a") === None, s"tol=$tol: only right row is in the past")
      assert(fwd("b") === None, s"tol=$tol: null-time left row must stay unmatched")
      val near = TemporalJoin.asofNearest(l, r, Seq("k"), "t", "rt",
          Seq("tag", "v"), tolerance = tol)
        .select("probe", "tag").as[(String, Option[String])].collect().toMap
      assert(near("a") === Some("ok") && near("b") === None, s"tol=$tol (nearest)")
    }
    val salted = TemporalJoin.asofBackwardSalted(l, r, Seq("k"), "t", "rt",
        Seq("tag", "v"), sliceSeconds = 50L)
      .select("probe", "tag").as[(String, Option[String])].collect().toMap
    assert(salted("a") === Some("ok") && salted("b") === None)
  }

  test("range join: inverted intervals are dropped before binning, not exploded") {
    // end=0 sentinel against an epoch start: sequence() would otherwise
    // DESCEND and generate ~17M bin rows from this one dirty row.
    val ivs = Seq((1L, 1700000000L, 0L, "dirty"), (1L, 100L, 200L, "clean"))
      .toDF("k", "s", "e", "iid")
    val pts = Seq((1L, 150L, "p1")).toDF("k", "t", "pid")
    val out = TemporalJoin.pointsInIntervals(ivs, pts, Seq("k"), "s", "e", "t", 60L)
    assert(out.select("iid", "pid").as[(String, String)].collect().toSet ===
      Set(("clean", "p1")))
  }

  test("range joins reject mixed time-class columns eagerly") {
    val ivs = Seq((1L, 100L, 200L, "i1")).toDF("k", "s", "e", "iid")
    val ptsTs = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 03:00:00"), "p1"))
      .toDF("k", "t", "pid")
    val e1 = intercept[IllegalArgumentException] {
      TemporalJoin.pointsInIntervals(ivs, ptsTs, Seq("k"), "s", "e", "t", 100L)
    }
    assert(e1.getMessage.contains("same kind"))
    val bTs = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "b1")).toDF("k", "bs", "be", "bid")
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoin.intervalsOverlap(ivs.withColumnRenamed("iid", "aid"), bTs,
        Seq("k"), "s", "e", "bs", "be", 3600L)
    }
    assert(e2.getMessage.contains("same kind"))
  }
}
