package graft

import graft.clean.Casts
import graft.functions.{DateTimeFns, IsoDurationSeconds}
import graft.model.Identifier
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based parity checks (SURVEY §5 adoption plan): the cast
  * cascade, identifier resolution, the calendar diff and the ISO
  * duration expression hold their invariants over generated inputs.
  * (Raw ScalaCheck generators with fixed seeds — the scalatest bridge
  * isn't on the offline classpath.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: calendar diff round-trips via add-years→months→days") {
    val dates = Gen.choose(-20000, 40000) // ~1915..2079 as epoch days
    val pairs = samples(Gen.zip(dates, dates), 60)
    val df = pairs.map { case (a, b) =>
      (java.time.LocalDate.ofEpochDay(math.min(a, b).toLong).toString,
        java.time.LocalDate.ofEpochDay(math.max(a, b).toLong).toString)
    }.toDF("s", "e")
    val rows = df.select(col("s"), col("e"),
      DateTimeFns.calendarDiff(to_date(col("s")), to_date(col("e"))).as("d"))
      .select(col("s"), col("e"), col("d.years"), col("d.months"), col("d.days"))
      .collect()
    rows.foreach { r =>
      val d1 = java.time.LocalDate.parse(r.getString(0))
      val d2 = java.time.LocalDate.parse(r.getString(1))
      val (y, m, dd) = (r.getInt(2), r.getInt(3), r.getInt(4))
      // canonical components
      assert(y >= 0 && m >= 0 && m < 12 && dd >= 0 && dd <= 31, s"non-canonical $y $m $dd")
      // NOTE: Postgres/DuckDB age() components are NOT reconstructible
      // via plusYears/plusMonths/plusDays (the borrow comes from the
      // START month, the reconstruction traverses the month before the
      // END — this very property failure documented it). The oracle for
      // engine parity is DuckDB (t4 hash-match); here we pin the
      // algorithm against an independent reimplementation.
      val (ey, em, ed) = PropertySpec.referenceAge(d1, d2)
      assert((y, m, dd) == ((ey, em, ed)),
        s"$d1→$d2: got ${y}Y${m}M${dd}D, reference ${ey}Y${em}M${ed}D")
    }
    // The native CalendarAgeIso expression must render exactly what the
    // column-algebra formulation renders (it replaced it on the hot path).
    val isoRows = df.select(
      graft.functions.GraftExtensions.calendar_age_iso(
        to_date(col("s")), to_date(col("e"))).as("native"),
      DateTimeFns.toIso8601(
        DateTimeFns.calendarDiff(to_date(col("s")), to_date(col("e")))).as("algebra"))
      .collect()
    isoRows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"native ${r.getString(0)} != algebra ${r.getString(1)}"))
  }

  test("property: cascade re-infers rendered longs losslessly incl. beyond 2^53") {
    val xsGen = Gen.nonEmptyListOf(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))
    samples(xsGen, 10).foreach { xs =>
      val df = xs.map(_.toString).toDF("c")
      val (t, casted) = Casts.ambivalent(df, "c")
      assert(t == LongType, s"inferred $t for $xs")
      assert(df.select(casted).collect().map(_.getLong(0)).toList == xs)
    }
    samples(Gen.nonEmptyListOf(Gen.oneOf("true", "False", "TRUE", "false")), 5).foreach { bs =>
      assert(Casts.ambivalent(bs.toDF("c"), "c")._1 == BooleanType)
    }
  }

  test("property: identifier resolution invariants") {
    samples(Gen.nonEmptyListOf(Gen.identifier).map(_.distinct), 30).foreach { cols =>
      // Single resolves its own column exactly once, in place
      assert(Identifier.Single(cols.head).resolve(cols) == Seq(cols.head))
      // Multi preserves table order regardless of request order
      assert(Identifier.Multi(cols.reverse).resolve(cols) == cols)
      // Regex .* matches everything in order
      assert(Identifier.regex(".*").resolve(cols) == cols)
    }
  }

  test("property: iso_duration_seconds equals component arithmetic") {
    val g = Gen.choose(0, 200)
    samples(Gen.zip(g, g, g), 50).foreach { case (y, m, d) =>
      if (y + m + d > 0) {
        val out = IsoDurationSeconds.evalBoxed(UTF8String.fromString(s"P${y}Y${m}M${d}D"))
        assert(out == y.toLong * IsoDurationSeconds.SecondsPerYear +
          m.toLong * IsoDurationSeconds.SecondsPerMonth + d.toLong * 86400L)
      }
    }
  }

  test("property: global index is row_number under any partition count") {
    import graft.ops.GlobalIndex
    val rows = samples(Gen.zip(Gen.choose(0, 50), Gen.choose(0L, 1000000L)), 120)
      .distinct
    val df = rows.toDF("k", "v")
    val want = rows.sortBy(t => (t._1, t._2)).zipWithIndex
      .map { case ((k, v), i) => (k, v, i + 1L) }
    samples(Gen.choose(1, 40), 4).foreach { n =>
      val got = GlobalIndex.withGlobalIndex(df, Seq(col("k"), col("v")), "idx",
        partitions = Some(n))
        .as[(Int, Long, Long)].collect().toSeq.sortBy(_._3)
      assert(got == want, s"partitions=$n")
    }
  }

  test("property: mixture composition is exact for integer parts, monotone in w") {
    import graft.ops.Mixture
    val ids = (1L to 300L).map(i => (i, "s")).toDF("id", "src")
    val weights = samples(Gen.choose(0.0, 4.0), 12)
    val sizes = weights.map { w =>
      val out = Mixture.mixCorpora(ids, "id", "src", Map("s" -> w))
      val n = out.count()
      // exact floor(w) copies guaranteed; fractional tail bounded
      assert(n >= math.floor(w).toLong * 300, s"w=$w n=$n")
      assert(n <= math.ceil(w).toLong * 300, s"w=$w n=$n")
      w -> n
    }
    // monotone: more weight never yields fewer rows
    sizes.sortBy(_._1).sliding(2).foreach {
      case Seq((w1, n1), (w2, n2)) =>
        assert(n1 <= n2, s"w=$w1 gave $n1 rows but w=$w2 gave $n2")
      case _ => ()
    }
  }

  test("property: native url_registrable_domain equals the regex chain on generated URLs") {
    // The native expression replaced the five-regex chain on every hot
    // path this round — same precedent as CalendarAgeIso above: the
    // rewrite must be EXACTLY equal, pinned over generated adversarial
    // structure, not just hand-picked cases. (The one documented
    // divergence — Locale.ROOT vs default-locale lowering — is
    // unobservable outside tr/az/lt hosts.)
    val scheme = Gen.oneOf("http", "https", "HTTP", "HtTpS", "ftp",
      "a+b-c.9", "1bad", "h~x", "", "no scheme")
    val sep = Gen.oneOf("://", ":/", "//", "")
    val user = Gen.oneOf("", "u@", "u:p@", "a@b@", "@")
    val label = Gen.oneOf("www", "WWW", "a", "site9", "xn--x", "", "CO",
      "über", "a b", "ÜBER")
    val host = Gen.chooseNum(0, 4).flatMap(n =>
      Gen.listOfN(n, label).map(_.mkString(".")))
    val suffix = Gen.oneOf("", ".com", ".co.uk", ".COM.au", ".", "..", ".x")
    val port = Gen.oneOf("", ":80", ":443", ":8080", ":0080", ":")
    val tail = Gen.oneOf("", "/", "/p?q=1#f", "?x", "#f", "/a/b/", "#")
    val url = for {
      s <- scheme; p <- sep; u <- user; h <- host
      sx <- suffix; pt <- port; t <- tail
    } yield s + p + u + h + sx + pt + t
    val urls = (samples(url, 500) ++ samples(Gen.asciiPrintableStr, 100) ++
      Seq(null, "")).distinct
    val rows = urls.map(Tuple1(_)).toDF("url").select(col("url"),
        graft.ops.Urls.registrableDomainOfUrl(col("url")).as("native"),
        graft.ops.Urls.registrableDomain(
          graft.ops.Urls.hostOf(col("url"))).as("chain"))
      .collect()
    assert(rows.length > 300) // the generator really produced variety
    rows.foreach { r =>
      assert(Option(r.getString(1)) == Option(r.getString(2)),
        s"url='${r.getString(0)}' native=${r.getString(1)} chain=${r.getString(2)}")
    }
  }
}

object PropertySpec {
  /** Independent reimplementation of the Postgres/DuckDB age() borrow
    * rule (day deficit borrows days_in_month(start)), used to pin the
    * column-expression implementation.
    */
  def referenceAge(d1: java.time.LocalDate, d2: java.time.LocalDate): (Int, Int, Int) = {
    var y = d2.getYear - d1.getYear
    var m = d2.getMonthValue - d1.getMonthValue
    var d = d2.getDayOfMonth - d1.getDayOfMonth
    if (d < 0) { d += d1.lengthOfMonth(); m -= 1 }
    if (m < 0) { m += 12; y -= 1 }
    (y, m, d)
  }
}
