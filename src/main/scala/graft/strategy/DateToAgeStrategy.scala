package graft.strategy

import graft.model._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T4 — convert every date-typed time column into an ISO-8601 age
  * relative to the patient's date of birth, then rewrite the data
  * contexts `*(Date) → *(Age)` (reference
  * `phenoxtract/src/transform/strategies/date_to_age.rs:55-322`).
  *
  * Spark shape: the patient→DOB map is assembled with one aggregation
  * over the union of all DateOfBirth columns (erroring when a patient
  * carries conflicting DOBs — reference `date_to_age.rs:222-271`), then
  * **broadcast-joined** onto every table that has date-typed columns
  * (the reference builds the same map driver-side; broadcasting keeps
  * the shape at 100 TB — the map is one row per patient, small relative
  * to facts, and the join never shuffles the fact tables).
  *
  * `strict`: a date cell whose patient has no DOB is an error; lenient
  * mode leaves null.
  */
final case class DateToAgeStrategy(strict: Boolean = true) extends Strategy {
  val name = "date_to_age"

  private def dateCols(cdf: Cdf): Seq[(String, SeriesContext)] =
    cdf.bindings.filter { case (_, sc) => TimeContexts.isDateTyped(sc.dataContext) }

  override def isValid(tables: Seq[Cdf]): Boolean =
    tables.exists(t => dateCols(t).nonEmpty) &&
      tables.exists(t => t.columnsOfKind(ContextKind.KDateOfBirth).nonEmpty)

  protected def internalTransform(tables: Seq[Cdf]): Seq[Cdf] = {
    val dobMap = buildDobMap(tables)

    tables.map { cdf =>
      val targets = dateCols(cdf)
      if (targets.isEmpty) cdf
      else {
        val subject = cdf.subjectIdColumn
        val joined = cdf.df.join(
          broadcast(dobMap.withColumnRenamed("__subject", subject)),
          Seq(subject), "left")

        // Negative ages (date before DOB) accumulate to one error.
        val negChecks = targets.map { case (c, _) =>
          count(when(toDate(col(c)) < col("__dob"), 1)).as(c)
        }
        val negRow = joined.agg(negChecks.head, negChecks.tail: _*).head()
        val negCols = targets.map(_._1).zipWithIndex.collect {
          case (c, i) if negRow.getLong(i) > 0 => c
        }
        if (negCols.nonEmpty)
          throw MappingException(name, negCols,
            "column(s) contain dates before the patient's date of birth")

        if (strict) {
          val orphan = targets.map { case (c, _) =>
            count(when(toDate(col(c)).isNotNull && col("__dob").isNull, 1)).as(c)
          }
          val row = joined.agg(orphan.head, orphan.tail: _*).head()
          val bad = targets.map(_._1).zipWithIndex.collect {
            case (c, i) if row.getLong(i) > 0 => c
          }
          if (bad.nonEmpty)
            throw MappingException(name, bad,
              "column(s) contain dates for patients with no date of birth")
        }

        // Native CalendarAgeIso, not the calendarDiff+toIso8601 column
        // algebra: the algebraic form re-inlines the multi-format date
        // parse into every diff component and blew past janino's method
        // limits (stage fell back to interpreted eval).
        val converted = targets.foldLeft(joined) { case (acc, (c, _)) =>
          acc.withColumn(c,
            graft.functions.GraftExtensions.calendar_age_iso(
              col("__dob"), toDate(col(c))))
        }.drop("__dob")

        // Context rewrite *(Date) → *(Age), driver-side.
        val newSeries = cdf.context.seriesContexts.map { sc =>
          if (TimeContexts.isDateTyped(sc.dataContext))
            sc.copy(dataContext = TimeContexts.toAgeTyped(sc.dataContext))
          else sc
        }
        Cdf(cdf.context.copy(seriesContexts = newSeries), converted)
      }
    }
  }

  /** Dates may arrive as DateType/TimestampType (preprocessor-cast) or
    * as strings in one of the supported formats.
    */
  private def toDate(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(c.try_cast("date"), graft.clean.Casts.toDateMulti(c.cast("string")))

  /** One row per patient: `__subject`, `__dob` (DateType). Conflicting
    * DOBs for one patient → error with the offending subject ids.
    */
  private def buildDobMap(tables: Seq[Cdf]): DataFrame = {
    val pieces = for {
      cdf <- tables
      dobCol <- cdf.columnsOfKind(ContextKind.KDateOfBirth)
    } yield cdf.df
      .select(col(cdf.subjectIdColumn).cast("string").as("__subject"),
        toDate(col(dobCol)).as("__dob"))
      .filter(col("__dob").isNotNull)
    require(pieces.nonEmpty, s"strategy $name: no DateOfBirth column found")

    val all = pieces.reduce(_ unionByName _)
    val agg = all.groupBy(col("__subject"))
      .agg(collect_set(col("__dob")).as("__dobs"))
    val conflicted = agg.filter(size(col("__dobs")) > 1)
      .select(col("__subject")).limit(20).collect().map(_.getString(0))
    if (conflicted.nonEmpty)
      throw MappingException(name, conflicted.toSeq,
        "patient(s) with more than one distinct date of birth")
    agg.select(col("__subject"), element_at(col("__dobs"), 1).as("__dob"))
  }
}
