package graft.model

import graft.SparkSpec

/** Identifier resolution semantics (ports `table_context.rs:419-509`)
  * and Cdf validation rules
  * (`validation/contextualised_dataframe_validation.rs:9-90`).
  */
class ModelSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("subject_id", "age", "Phenotypic Features 1", "Phenotypic Features 2")

  test("Single identifier: exact match only") {
    assert(Identifier.Single("age").resolve(cols) == Seq("age"))
    assert(Identifier.Single("Age").resolve(cols).isEmpty)
  }

  test("Regex identifier: findFirstIn semantics, table order") {
    assert(Identifier.regex("Phenotypic Features \\d+").resolve(cols) ==
      Seq("Phenotypic Features 1", "Phenotypic Features 2"))
    assert(Identifier.regex("Features").resolve(cols) ==
      Seq("Phenotypic Features 1", "Phenotypic Features 2")) // substring find, not full match
  }

  test("Multi identifier: set membership, table order") {
    assert(Identifier.Multi(Seq("age", "missing", "subject_id")).resolve(cols) ==
      Seq("subject_id", "age"))
  }

  private def ctx(series: SeriesContext*) = TableContext("t", series)
  private val subjectSeries =
    SeriesContext(Identifier.Single("subject_id"), dataContext = Context.SubjectId)

  test("validation: exactly one SubjectId required") {
    val df = Seq(("P1", 3L)).toDF("subject_id", "age")
    Cdf.validated(ctx(subjectSeries), df) // ok
    intercept[IllegalArgumentException] {
      Cdf.validated(ctx(), df)
    }
    intercept[IllegalArgumentException] {
      Cdf.validated(ctx(subjectSeries,
        SeriesContext(Identifier.Single("age"), dataContext = Context.SubjectId)), df)
    }
  }

  test("validation: no nulls in SubjectId") {
    val df = Seq(Some("P1"), None).map(s => Tuple1(s.orNull)).toDF("subject_id")
    intercept[IllegalArgumentException] {
      Cdf.validated(ctx(subjectSeries), df)
    }
  }

  test("validation: at most one SeriesContext per physical column") {
    val df = Seq(("P1", 3L)).toDF("subject_id", "age")
    intercept[IllegalArgumentException] {
      Cdf.validated(ctx(subjectSeries,
        SeriesContext(Identifier.Single("age"), dataContext = Context.Onset(TimeKind.Age)),
        SeriesContext(Identifier.regex("^a"), dataContext = Context.Severity)), df)
    }
  }

  test("validation: dangling Single identifier rejected, dangling regex allowed") {
    val df = Seq(("P1", 3L)).toDF("subject_id", "age")
    intercept[IllegalArgumentException] {
      Cdf.validated(ctx(subjectSeries,
        SeriesContext(Identifier.Single("nope"), dataContext = Context.Hpo)), df)
    }
    Cdf.validated(ctx(subjectSeries,
      SeriesContext(Identifier.regex("nope"), dataContext = Context.Hpo)), df) // ok
  }

  test("singleLinkedColumn: 0 → None, 1 → value, >1 → error") {
    val df = Seq(("P1", "HP:0000001", "P3Y", "P4Y")).toDF("subject_id", "hpo", "onset1", "onset2")
    val one = Cdf.validated(ctx(subjectSeries,
      SeriesContext(Identifier.Single("hpo"), dataContext = Context.Hpo, buildingBlockId = Some("A")),
      SeriesContext(Identifier.Single("onset1"), dataContext = Context.Onset(TimeKind.Age), buildingBlockId = Some("A"))), df)
    assert(one.singleLinkedColumn(Some("A"), Set(ContextKind.KOnset)) == Some("onset1"))
    assert(one.singleLinkedColumn(Some("B"), Set(ContextKind.KOnset)).isEmpty)

    val two = Cdf.validated(ctx(subjectSeries,
      SeriesContext(Identifier.Single("onset1"), dataContext = Context.Onset(TimeKind.Age), buildingBlockId = Some("A")),
      SeriesContext(Identifier.Single("onset2"), dataContext = Context.Onset(TimeKind.Age), buildingBlockId = Some("A"))), df)
    intercept[IllegalStateException] {
      two.singleLinkedColumn(Some("A"), Set(ContextKind.KOnset))
    }
  }
}
