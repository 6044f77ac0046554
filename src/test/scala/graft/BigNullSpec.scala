package graft

import graft.collect.AssemblerConfig
import graft.model._
import graft.ontology.{BiDict, BiDictLibrary, Resource}
import graft.strategy._

/** Degenerate-input robustness (reference A.7,
  * `integration_tests/tests/big_null_test.rs:36-110`): a wide table
  * covering every major context with ALL data cells empty, plus
  * duplicate patient rows — the full strategy stack must run without
  * error and emit minimal packets.
  */
class BigNullSpec extends SparkSpec {
  import spark.implicits._

  test("all-null wide table through the full stack emits minimal packets") {
    val df = Seq(
      ("P1", null, null, null, null, null, null, null, null, null, null, null),
      ("P1", null, null, null, null, null, null, null, null, null, null, null),
      ("P2", null, null, null, null, null, null, null, null, null, null, null)
    ).asInstanceOf[Seq[(String, String, String, String, String, String, String,
        String, String, String, String, String)]]
      .toDF("subject_id", "sex", "dob", "vital", "death_age", "cause", "survival",
        "hpo", "onset", "disease", "gene", "hgvs")

    val cdf = Cdf.validated(TableContext("wide", Seq(
      SeriesContext(Identifier.Single("subject_id"), dataContext = Context.SubjectId),
      SeriesContext(Identifier.Single("sex"), dataContext = Context.SubjectSex),
      SeriesContext(Identifier.Single("dob"), dataContext = Context.DateOfBirth),
      SeriesContext(Identifier.Single("vital"), dataContext = Context.VitalStatus),
      SeriesContext(Identifier.Single("death_age"), dataContext = Context.TimeOfDeath(TimeKind.Age)),
      SeriesContext(Identifier.Single("cause"), dataContext = Context.CauseOfDeath),
      SeriesContext(Identifier.Single("survival"), dataContext = Context.SurvivalTimeDays),
      SeriesContext(Identifier.Single("hpo"), dataContext = Context.Hpo, buildingBlockId = Some("A")),
      SeriesContext(Identifier.Single("onset"), dataContext = Context.Onset(TimeKind.Age), buildingBlockId = Some("A")),
      SeriesContext(Identifier.Single("disease"), dataContext = Context.Disease, buildingBlockId = Some("C")),
      SeriesContext(Identifier.Single("gene"), dataContext = Context.Hgnc, buildingBlockId = Some("C")),
      SeriesContext(Identifier.Single("hgvs"), dataContext = Context.Hgvs, buildingBlockId = Some("C")))), df)

    val lib = BiDictLibrary(Seq(BiDict.fromEntries(
      Resource("hp", "hpo", "u", "v", "HP", "i"), Seq.empty)))
    val pipeline = Pipeline(
      strategies = Seq(
        AliasMapStrategy, MappingStrategy.defaultSex,
        MappingStrategy.defaultVitalStatus, AgeToIso8601Strategy()),
      library = lib,
      assembler = AssemblerConfig(cohort = "nulltest"))

    val packets = pipeline.transform(Seq(cdf)).collect().sortBy(_.id)
    assert(packets.map(_.id).toSeq == Seq("nulltest-P1", "nulltest-P2"))
    packets.foreach { p =>
      assert(p.subject.sex.isEmpty && p.subject.vitalStatus.isEmpty)
      assert(p.phenotypicFeatures.isEmpty && p.diseases.isEmpty &&
        p.interpretations.isEmpty && p.measurements.isEmpty)
    }
  }
}
