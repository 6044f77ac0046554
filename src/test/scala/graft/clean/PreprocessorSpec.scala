package graft.clean

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.types._

class PreprocessorSpec extends SparkSpec {
  import spark.implicits._

  private val subject =
    SeriesContext(Identifier.Single("subject_id"), dataContext = Context.SubjectId)

  test("full preprocess: trim, fill, collapse, re-infer, stringify subject") {
    val df = Seq(
      (1L, " 12 ", 3.0f, "  "),
      (2L, "7", 4.0f, " x ")
    ).toDF("subject_id", "age_str", "score", "note")
    val cdf = Cdf.validated(TableContext("t", Seq(subject,
      SeriesContext(Identifier.Single("age_str"), dataContext = Context.Onset(TimeKind.Age)),
      SeriesContext(Identifier.Single("note"), fillMissing = Some("none")))), df)
    val out = Preprocessor.process(cdf)
    val schema = out.df.schema
    assert(schema("subject_id").dataType == StringType) // P8
    assert(schema("age_str").dataType == LongType)      // P3 re-infer after trim
    assert(schema("score").dataType == LongType)        // P2 whole floats collapse
    val rows = out.df.orderBy("subject_id").collect()
    assert(rows(0).getString(schema.fieldIndex("note")) == "none") // fill applied to nulled empty
    assert(rows(1).getString(schema.fieldIndex("note")) == "x")    // trimmed
    assert(rows(0).getLong(schema.fieldIndex("age_str")) == 12L)
  }

  test("fillMissing casts the fill value to the column's type (no string promotion)") {
    import graft.model._
    // a BOOLEAN column with a string fill previously failed analysis
    // (coalesce(bool, string) unresolvable); a DOUBLE column was
    // silently string-promoted before re-inference
    val df = Seq((1L, Some(true), Some(1.5)), (2L, None, None))
      .toDF("subject_id", "flag", "score")
    val ctx = TableContext("t", Seq(
      SeriesContext(Identifier.Single("subject_id"), dataContext = Context.SubjectId),
      SeriesContext(Identifier.Single("flag"), dataContext = Context.ObservationStatus,
        fillMissing = Some("false")),
      SeriesContext(Identifier.Single("score"), dataContext = Context.SurvivalTimeDays,
        fillMissing = Some("0.5"))))
    val out = Preprocessor.fillMissing(Cdf.validated(ctx, df), df)
    assert(out.schema("flag").dataType == org.apache.spark.sql.types.BooleanType)
    assert(out.schema("score").dataType == org.apache.spark.sql.types.DoubleType)
    val r2 = out.orderBy("subject_id").collect()(1)
    assert(r2.getBoolean(out.schema.fieldIndex("flag")) == false)
    assert(r2.getDouble(out.schema.fieldIndex("score")) == 0.5)
  }
}
