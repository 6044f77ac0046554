package graft

import graft.collect.{Assembler, AssemblerConfig, Facts}
import graft.model._
import graft.ontology._
import graft.strategy._

/** End-to-end pipeline test over in-memory tables that mirror the
  * reference's integration fixtures (FIXTURES.md §A; semantics from
  * `integration_tests/tests/test_pipeline_integration.rs` — inputs
  * re-authored, not copied): CSV-shaped subject + phenotype + disease +
  * measurement tables through preprocess → strategies → assembly.
  */
class PipelineE2eSpec extends SparkSpec {
  import spark.implicits._

  private val hp = BiDict.fromEntries(
    Resource("hp", "human phenotype ontology", "http://purl.obolibrary.org/obo/hp.owl",
      "2024-01-01", "HP", "http://purl.obolibrary.org/obo/HP_"),
    Seq(
      ("HP:0001945", "Fever", Seq("febrile", "pyrexia")),
      ("HP:0002615", "Hypotension", Seq("low blood pressure")),
      ("HP:0000822", "Hypertension", Seq()),
      ("HP:0000246", "Sinusitis", Seq()),
      ("HP:0012373", "Abnormal eye physiology", Seq()),
      ("HP:0031417", "Rhinorrhea", Seq()),
      ("HP:0410333", "Seafood allergy", Seq()),
      ("HP:0410327", "Dairy allergy", Seq()),
      ("HP:0410329", "Gluten allergy", Seq())))

  private val mondo = BiDict.fromEntries(
    Resource("mondo", "Mondo Disease Ontology", "http://purl.obolibrary.org/obo/mondo.owl",
      "2024-01-01", "MONDO", "http://purl.obolibrary.org/obo/MONDO_"),
    Seq(("MONDO:0008258", "Spondylocostal Dysostosis", Seq())))

  private val pato = BiDict.fromEntries(
    Resource("pato", "PhenotypicFeature And Trait Ontology", "http://purl.obolibrary.org/obo/pato.owl",
      "2024-01-01", "PATO", "http://purl.obolibrary.org/obo/PATO_"),
    Seq(("PATO:0000460", "abnormal", Seq()), ("PATO:0000462", "absent", Seq())))

  private val hgnc = BiDict.fromEntries(
    Resource("hgnc", "HUGO Gene Nomenclature Committee",
      "https://w3id.org/biopragmatics/resources/hgnc/hgnc.json.gz", "-",
      "hgnc", "https://www.genenames.org/data/gene-symbol-report/#!/hgnc_id/$1"),
    Seq(("HGNC:19349", "KIF21A", Seq())))

  private val geno = BiDict.fromEntries(
    Resource("geno", "Genotype Ontology", "http://purl.obolibrary.org/obo/geno.json",
      "2025-07-25", "GENO", "http://purl.obolibrary.org/obo/GENO_$1"),
    Seq(("GENO:0000135", "heterozygous", Seq()), ("GENO:0000136", "homozygous", Seq())))

  private val library = BiDictLibrary(Seq(hp, mondo, pato, hgnc, geno))

  private val subject =
    SeriesContext(Identifier.Single("subject_id"), dataContext = Context.SubjectId)

  test("full pipeline: individual + phenotypes + disease + measurements") {
    // Table 1: basic info (A.6 'basic info' shape)
    val basic = Seq(
      ("P001", "m", "Yes", "1990-01-15", "45"),
      ("P002", "FEMALE", "no", "2000-06-30", "")
    ).toDF("subject_id", "Sex", "Living", "DOB", "Age of death")
    val basicCdf = Cdf.validated(TableContext("basic", Seq(subject,
      SeriesContext(Identifier.Single("Sex"), dataContext = Context.SubjectSex),
      SeriesContext(Identifier.Single("Living"), dataContext = Context.VitalStatus,
        aliasMap = Some(AliasMap(Map("Yes" -> Some("ALIVE"), "No" -> Some("DECEASED"))))),
      SeriesContext(Identifier.Single("DOB"), dataContext = Context.DateOfBirth),
      SeriesContext(Identifier.Single("Age of death"),
        dataContext = Context.TimeOfDeath(TimeKind.Age)))), basic)

    // Table 2: phenotypes with onset dates (A.2 shape, already row-oriented)
    val pheno = Seq(
      ("P001", "fever", "1998-04-25"),
      ("P001", "Low blood Pressure", "1998-04-25"),
      ("P002", "HYPERtension", "2001-06-29")
    ).toDF("subject_id", "phenotype", "Date of onset")
    val phenoCdf = Cdf.validated(TableContext("pheno", Seq(subject,
      SeriesContext(Identifier.Single("phenotype"), dataContext = Context.Hpo,
        buildingBlockId = Some("A")),
      SeriesContext(Identifier.Single("Date of onset"),
        dataContext = Context.Onset(TimeKind.Date), buildingBlockId = Some("A")))), pheno)

    // Table 3: disease + gene/variants (A.4 shape)
    val disease = Seq(
      ("P001", "MONDO:0008258", "P45Y10M5D", "KIF21A",
        "NM_001173464.1:c.2860C>T", "NM_001173464.1:c.2860C>T")
    ).toDF("subject_id", "diseases", "disease_onset", "gene", "hgvs1", "hgvs2")
    val diseaseCdf = Cdf.validated(TableContext("disease", Seq(subject,
      SeriesContext(Identifier.Single("diseases"), dataContext = Context.Disease,
        buildingBlockId = Some("C")),
      SeriesContext(Identifier.Single("disease_onset"),
        dataContext = Context.Onset(TimeKind.Age), buildingBlockId = Some("C")),
      SeriesContext(Identifier.Single("gene"), dataContext = Context.Hgnc,
        buildingBlockId = Some("C")),
      SeriesContext(Identifier.Multi(Seq("hgvs1", "hgvs2")), dataContext = Context.Hgvs,
        buildingBlockId = Some("C")))), disease)

    // Table 4: measurements (A.5 shape)
    val meas = Seq(
      ("P001", "175", "150", "200", "abnormal", "21.1.2026")
    ).toDF("subject_id", "height (cm)", "ref_low", "ref_high", "nitrates in urine", "date_of_observation")
    val measCdf = Cdf.validated(TableContext("meas", Seq(subject,
      SeriesContext(Identifier.Single("height (cm)"),
        dataContext = Context.QuantitativeMeasurement("LOINC:8302-2", "UO:0000015"),
        buildingBlockId = Some("M")),
      SeriesContext(Identifier.Single("ref_low"), dataContext = Context.ReferenceRangeStart,
        buildingBlockId = Some("M")),
      SeriesContext(Identifier.Single("ref_high"), dataContext = Context.ReferenceRangeEnd,
        buildingBlockId = Some("M")),
      SeriesContext(Identifier.Single("nitrates in urine"),
        dataContext = Context.QualitativeMeasurement("LOINC:5802-4"),
        buildingBlockId = Some("M")),
      SeriesContext(Identifier.Single("date_of_observation"),
        dataContext = Context.TimeOfMeasurement(TimeKind.Date), buildingBlockId = Some("M")))), meas)

    val pipeline = Pipeline(
      strategies = Seq(
        AliasMapStrategy,
        MappingStrategy.defaultSex,
        MappingStrategy.defaultVitalStatus,
        AgeToIso8601Strategy(),
        DateToAgeStrategy(strict = false),
        OntologyNormaliserStrategy(library, targetKinds = Set(ContextKind.KHpo))),
      library = library,
      assembler = AssemblerConfig(cohort = "cohort"))

    val packets = pipeline.transform(Seq(basicCdf, phenoCdf, diseaseCdf, measCdf))
      .collect().sortBy(_.id)
    assert(packets.map(_.id).toSeq == Seq("cohort-P001", "cohort-P002"))

    val p1 = packets(0)
    assert(p1.subject.sex.contains("MALE"))
    assert(p1.subject.dateOfBirth.contains("1990-01-15T00:00:00Z"))
    assert(p1.subject.vitalStatus.map(_.status).contains("ALIVE"))
    // onset date converted to age by DateToAge: 1990-01-15 → 1998-04-25
    val fever = p1.phenotypicFeatures.find(_.`type`.id == "HP:0001945").get
    assert(fever.`type`.label == "Fever")
    assert(fever.onset.flatMap(_.age).map(_.iso8601duration).contains("P8Y3M10D"))
    val hypo = p1.phenotypicFeatures.find(_.`type`.id == "HP:0002615").get
    assert(hypo.`type`.label == "Hypotension") // synonym resolved
    // disease + homozygous variant interpretation
    assert(p1.diseases.map(_.term.id).toSeq == Seq("MONDO:0008258"))
    assert(p1.diseases.head.onset.flatMap(_.age).map(_.iso8601duration).contains("P45Y10M5D"))
    val interp = p1.interpretations.head
    assert(interp.id == "cohort-P001-MONDO:0008258")
    val gi = interp.diagnosis.get.genomicInterpretations
    assert(gi.size == 1)
    assert(gi.head.variantInterpretation.get.variationDescriptor.get
      .allelicState.get.label == "homozygous")
    // measurements: quantity with ref range + qualitative PATO value
    val height = p1.measurements.find(_.assay.id == "LOINC:8302-2").get
    assert(height.value.quantity.get.value == 175.0)
    assert(height.value.quantity.get.referenceRange.get.low == 150.0)
    // date_of_observation 2026-01-21 ran through DateToAge (DOB 1990-01-15);
    // zero-valued components are omitted (reference iso8601-duration rendering)
    assert(height.timeObserved.flatMap(_.age).map(_.iso8601duration).contains("P36Y6D"))
    val nitrates = p1.measurements.find(_.assay.id == "LOINC:5802-4").get
    assert(nitrates.value.ontologyClass.get.id == "PATO:0000460")
    // resources deduped into metadata
    assert(p1.metaData.resources.map(_.id).contains("hp"))

    val p2 = packets(1)
    assert(p2.subject.sex.contains("FEMALE"))
    assert(p2.subject.vitalStatus.map(_.status).contains("DECEASED"))
    assert(p2.phenotypicFeatures.map(_.`type`.id).toSeq == Seq("HP:0000822"))
    assert(p2.phenotypicFeatures.head.onset.flatMap(_.age)
      .map(_.iso8601duration).contains("P11M29D"))
  }

  test("multi-HPO expansion feeds header collector with excluded=false flags") {
    val df = Seq(
      ("P001", "seafood allergy HP:0410333 and dairy HP:0410327"),
      ("P002", "gluten HP:0410329")
    ).toDF("subject_id", "HPOs")
    val cdf = Cdf.validated(TableContext("hpos", Seq(subject,
      SeriesContext(Identifier.Single("HPOs"), dataContext = Context.MultiHpoId,
        buildingBlockId = Some("B")))), df)

    val expanded = MultiHpoColExpansionStrategy.transform(Seq(cdf))
    val facts = Facts.extractAll(expanded)
    val packets = Assembler.assemble(facts, library, AssemblerConfig("c"))
      .collect().sortBy(_.id)
    val p1 = packets(0)
    assert(p1.phenotypicFeatures.map(_.`type`.id).toSet == Set("HP:0410333", "HP:0410327"))
    assert(p1.phenotypicFeatures.forall(_.excluded.isEmpty)) // observed → not excluded
    // P002 has null flags for P001's allergies → no feature emitted
    val p2 = packets(1)
    assert(p2.phenotypicFeatures.map(_.`type`.id).toSeq == Seq("HP:0410329"))
  }

  test("JSON rendering follows protobuf conventions incl. survivalTimeInDays==0 suppression") {
    import graft.collect._
    val p = Phenopacket(
      id = "c-P1",
      subject = Individual("P1", sex = Some("MALE"),
        vitalStatus = Some(VitalStatus("ALIVE", survivalTimeInDays = Some(0L)))),
      metaData = MetaData("2024-01-01T00:00:00Z", "graft"))
    val json = PhenopacketJson.render(p)
    assert(json.contains("\"sex\": \"MALE\""))
    assert(!json.contains("survivalTimeInDays")) // == 0 suppressed (S6)
    assert(!json.contains("phenotypicFeatures")) // empty arrays omitted
    assert(json.contains("\"phenopacketSchemaVersion\": \"2.0\""))
  }
}
