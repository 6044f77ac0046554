package graft.collect

import graft.SparkSpec
import graft.ontology.{BiDict, BiDictLibrary, Resource}

/** Direct assembler semantics: G6 spread, HGVS validation, G4
  * multiplicity guards, upsert behavior — on hand-built fact lists
  * (no Spark round-trip needed; assembleOne is the per-group fold).
  */
class AssemblerSpec extends SparkSpec {

  private val mondo = BiDict.fromEntries(
    Resource("mondo", "MONDO", "u", "v", "MONDO", "i"),
    Seq(("MONDO:1", "disease one", Seq.empty), ("MONDO:2", "disease two", Seq.empty)))
  private val lib = BiDictLibrary(Seq(mondo))
  private val cfg = AssemblerConfig("c")

  private def fact(table: String, seq: Long, block: String, kind: String,
      attrs: (String, String)*) =
    Fact("P1", table, seq, block, kind, attrs.toMap)

  test("G6: disease block spread across 2 tables with 2 diseases errors") {
    val facts = Seq(
      fact("t1", 0, "C", FactKinds.DiseaseK, "term" -> "MONDO:1"),
      fact("t2", 0, "C", FactKinds.DiseaseK, "term" -> "MONDO:2"),
      fact("t2", 0, "C", FactKinds.Interp, "variants" -> "NM_1.1:c.1A>G"))
    val e = intercept[IllegalStateException] {
      Assembler.assembleOne("P1", facts, lib, cfg)
    }
    assert(e.getMessage.contains("spans 2 tables"))
  }

  test("G6: spread block with ONE distinct disease applies it to the variants") {
    val facts = Seq(
      fact("t1", 0, "C", FactKinds.DiseaseK, "term" -> "MONDO:1"),
      fact("t2", 0, "C", FactKinds.DiseaseK, "term" -> "MONDO:1"),
      fact("t2", 0, "C", FactKinds.Interp, "variants" -> "NM_1.1:c.1A>G"))
    val p = Assembler.assembleOne("P1", facts, lib, cfg)
    assert(p.interpretations.head.diagnosis.get.disease.id == "MONDO:1")
  }

  test("malformed HGVS errors with the offending expressions") {
    val facts = Seq(
      fact("t1", 0, "C", FactKinds.DiseaseK, "term" -> "MONDO:1"),
      fact("t1", 0, "C", FactKinds.Interp, "variants" -> "not-an-hgvs"))
    val e = intercept[IllegalStateException] {
      Assembler.assembleOne("P1", facts, lib, cfg)
    }
    assert(e.getMessage.contains("not-an-hgvs"))
  }

  test("G4: conflicting single-multiplicity individual field errors") {
    val facts = Seq(
      fact("t1", 0, "", FactKinds.Individual_, "field" -> "sex", "value" -> "MALE"),
      fact("t2", 0, "", FactKinds.Individual_, "field" -> "sex", "value" -> "FEMALE"))
    val e = intercept[IllegalStateException] {
      Assembler.assembleOne("P1", facts, lib, cfg)
    }
    assert(e.getMessage.contains("sex"))
  }

  test("feature upsert by HPO id vs allowDuplicatePhenotypes append") {
    val hp = BiDict.fromEntries(Resource("hp", "HPO", "u", "v", "HP", "i"),
      Seq(("HP:1", "f1", Seq.empty)))
    val l2 = BiDictLibrary(Seq(hp))
    val facts = Seq(
      fact("t1", 0, "A", FactKinds.HpoCell, "hpo" -> "HP:1"),
      fact("t1", 1, "A", FactKinds.HpoCell, "hpo" -> "HP:1", "onset" -> "P3Y"))
    val upserted = Assembler.assembleOne("P1", facts, l2, cfg)
    assert(upserted.phenotypicFeatures.size == 1)
    assert(upserted.phenotypicFeatures.head.onset.isDefined) // last write wins
    val dup = Assembler.assembleOne("P1", facts, l2,
      cfg.copy(allowDuplicatePhenotypes = true))
    assert(dup.phenotypicFeatures.size == 2)
  }

  test("interpretations EXTEND across rows of the same disease (no replace)") {
    val facts = Seq(
      fact("t1", 0, "C", FactKinds.DiseaseK, "term" -> "MONDO:1"),
      fact("t1", 0, "C", FactKinds.Interp, "variants" -> "NM_1.1:c.1A>G"),
      fact("t1", 1, "C", FactKinds.Interp, "variants" -> "NM_1.1:c.2C>T"))
    val p = Assembler.assembleOne("P1", facts, lib, cfg)
    val gis = p.interpretations.head.diagnosis.get.genomicInterpretations
    assert(gis.size == 2) // both rows' variants present
    assert(gis.flatMap(_.variantInterpretation)
      .flatMap(_.variationDescriptor).map(_.id).toSet ==
      Set("variant-NM_1.1:c.1A>G", "variant-NM_1.1:c.2C>T"))
  }

  test("block-less gene/variant columns produce no interpretation facts") {
    import spark.implicits._
    import graft.model._
    val df = Seq(("P1", "KIF21A", "MONDO:1")).toDF("subject_id", "gene", "disease")
    val cdf = Cdf.validated(TableContext("t", Seq(
      SeriesContext(Identifier.Single("subject_id"), dataContext = Context.SubjectId),
      SeriesContext(Identifier.Single("gene"), dataContext = Context.Hgnc),
      SeriesContext(Identifier.Single("disease"), dataContext = Context.Disease))), df)
    val kinds = Facts.extract(cdf).collect().map(_.kind).toSet
    assert(!kinds.contains(FactKinds.Interp))
    assert(kinds.contains(FactKinds.DiseaseK))
  }
}
