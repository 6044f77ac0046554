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
}
