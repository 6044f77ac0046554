package graft.collect

import graft.ontology.{BiDictLibrary, OntologyClass, Resource}
import org.apache.spark.sql.Dataset

import scala.collection.mutable

/** Per-patient phenopacket assembly — the engine's one shuffle
  * (reference G1/G2 + collectors C1–C9 + builder B1–B6,
  * `transform/collecting/`, `transform/phenopacket_builder.rs`).
  *
  * `groupByKey(subject).mapGroups`: each group is one patient's fact
  * list (document-sized, bounded), folded into a Phenopacket with the
  * reference's upsert/append semantics. The ontology library is a
  * broadcast-sized immutable value captured in the closure; Spark
  * serializes it once per executor.
  */
final case class AssemblerConfig(
    cohort: String,
    created: String = "1970-01-01T00:00:00Z",
    createdBy: String = "graft",
    allowDuplicatePhenotypes: Boolean = false)

object Assembler {

  def assemble(facts: Dataset[Fact], library: BiDictLibrary,
      config: AssemblerConfig): Dataset[Phenopacket] = {
    val spark = facts.sparkSession
    import spark.implicits._
    facts
      .groupByKey(_.subject)
      .mapGroups { (subject, it) =>
        assembleOne(subject, it.toSeq, library, config)
      }
  }

  /** Fold one patient's facts into a packet. Deterministic: facts are
    * sorted by (table, seq) — source row order (reference iterates rows
    * positionally).
    */
  def assembleOne(subject: String, factsUnsorted: Seq[Fact],
      library: BiDictLibrary, config: AssemblerConfig): Phenopacket = {
    val facts = factsUnsorted.sortBy(f => (f.table, f.seq))
    val packetId = s"${config.cohort}-$subject"
    val resources = mutable.LinkedHashMap.empty[String, Resource]

    // --- B3/B4: term resolution with resource provenance ------------
    def resolve(value: String): OntoClass = {
      val (oc, res) = library.resolveOrThrow(value)
      resources.getOrElseUpdate(res.id, res)
      OntoClass(oc.id, oc.label)
    }
    def resolveOpt(v: Option[String]): Option[OntoClass] = v.map(resolve)

    // Assay/unit CURIEs may live outside the loaded dictionaries
    // (e.g. LOINC without a LOINC dump): fall back to id-as-label.
    def resolveLenient(value: String): OntoClass =
      library.resolve(value) match {
        case Some((oc, res)) =>
          resources.getOrElseUpdate(res.id, res)
          OntoClass(oc.id, oc.label)
        case None => OntoClass(value, value)
      }

    def attr(f: Fact, k: String): Option[String] = f.attrs.get(k).filter(_.nonEmpty)

    // --- B5: time parsing (timestamp else ISO-8601 age) --------------
    def timeElement(v: String): TimeElement = TimeParse.parse(v)

    // --- C1: individual + vital status (single-multiplicity, G4) -----
    val indivFacts = facts.filter(_.kind == FactKinds.Individual_)
    def single(field: String): Option[String] = {
      val vals = indivFacts.filter(f => attr(f, "field").contains(field))
        .flatMap(f => attr(f, "value"))
      val distinct = vals.distinct
      if (distinct.size > 1)
        throw new IllegalStateException(
          s"patient $subject: expected at most one distinct '$field', got ${distinct.mkString(", ")}")
      distinct.headOption
    }
    def singleTimed(field: String): Option[TimeElement] =
      indivFacts.filter(f => attr(f, "field").contains(field))
        .flatMap(f => attr(f, "value").map(v => (v, attr(f, "tkind"))))
        .distinct match {
        case Seq()       => None
        case Seq((v, _)) => Some(timeElement(v))
        case many => throw new IllegalStateException(
          s"patient $subject: multiple values for '$field': ${many.map(_._1).mkString(", ")}")
      }

    val sex = single("sex")
    val dob = single("dateOfBirth").map(TimeParse.toTimestampString)
    val vitalStatusValue = single("vitalStatus")
    val causeOfDeath = single("causeOfDeath")
    val survivalDays = single("survivalTimeInDays").map { v =>
      v.toDoubleOption.filter(d => !d.isNaN && !d.isInfinite)
        .map(math.round)
        .getOrElse(throw new IllegalStateException(
          s"patient $subject: survivalTimeInDays value '$v' is not numeric"))
    }
    val timeOfDeath = singleTimed("timeOfDeath")
    val lastEncounter = singleTimed("timeAtLastEncounter")

    val vitalStatus =
      if (vitalStatusValue.isEmpty && causeOfDeath.isEmpty &&
          survivalDays.isEmpty && timeOfDeath.isEmpty) None
      else Some(VitalStatus(
        status = vitalStatusValue.getOrElse(
          if (timeOfDeath.isDefined || causeOfDeath.isDefined) "DECEASED" else "UNKNOWN_STATUS"),
        timeOfDeath = timeOfDeath,
        causeOfDeath = resolveOpt(causeOfDeath),
        survivalTimeInDays = survivalDays))

    val individual = Individual(
      id = subject, dateOfBirth = dob, sex = sex,
      timeAtLastEncounter = lastEncounter, vitalStatus = vitalStatus)

    // Observation statuses must be strictly boolean (reference requires
    // a bool column and errors otherwise — hpo_in_cells_collector /
    // hpo_in_header_collector): no lenient polarity guessing.
    def strictBool(v: String, what: String): Boolean = v.toLowerCase match {
      case "true"  => true
      case "false" => false
      case other => throw new IllegalStateException(
        s"patient $subject: $what value '$other' is not a boolean")
    }

    // --- C2: HPO-in-cells (upsert by HPO id unless duplicates allowed)
    val features = mutable.LinkedHashMap.empty[String, PhenotypicFeature]
    val extraFeatures = mutable.ArrayBuffer.empty[PhenotypicFeature]
    facts.filter(_.kind == FactKinds.HpoCell).foreach { f =>
      attr(f, "hpo").foreach { raw =>
        val term = resolve(raw)
        val observed = attr(f, "observed").map(strictBool(_, "observation status"))
        val feature = PhenotypicFeature(
          `type` = term,
          excluded = observed.collect { case false => true },
          onset = attr(f, "onset").map(timeElement),
          resolution = attr(f, "resolution").map(timeElement),
          severity = resolveOpt(attr(f, "severity")))
        if (config.allowDuplicatePhenotypes && features.contains(term.id))
          extraFeatures += feature
        else features(term.id) = feature // upsert: last write wins (B1)
      }
    }

    // --- C3: HPO-in-header (distinct (observed, onset) pairs, G5) -----
    val headerPairs = mutable.LinkedHashMap.empty[String, mutable.LinkedHashSet[(Boolean, Option[String])]]
    facts.filter(_.kind == FactKinds.HpoHeader).foreach { f =>
      (attr(f, "hpo"), attr(f, "observed")) match {
        case (Some(id), Some(obs)) =>
          headerPairs.getOrElseUpdate(id, mutable.LinkedHashSet.empty) +=
            ((strictBool(obs, s"HPO header $id observation"), attr(f, "onset")))
        case _ => ()
      }
    }
    headerPairs.foreach { case (id, pairs) =>
      if (pairs.size > 1)
        throw new IllegalStateException(
          s"patient $subject: HPO header column $id has ${pairs.size} distinct (observed, onset) pairs")
      val (observed, onset) = pairs.head
      val term = resolve(id)
      features(term.id) = PhenotypicFeature(
        `type` = term,
        excluded = if (observed) None else Some(true),
        onset = if (observed) onset.map(timeElement) else None)
    }

    // --- C4: diseases (append per cell; dedupe by term id) ------------
    val diseaseList = mutable.LinkedHashMap.empty[String, Disease]
    facts.filter(_.kind == FactKinds.DiseaseK).foreach { f =>
      attr(f, "term").foreach { raw =>
        val term = resolve(raw)
        diseaseList(term.id) = Disease(
          term = term,
          onset = attr(f, "onset").map(timeElement),
          resolution = attr(f, "resolution").map(timeElement),
          primarySite = resolveOpt(attr(f, "primarySite")))
      }
    }

    // --- C5: interpretations (gene/variant classification) ------------
    // G6 — building-block "spread" (reference
    // interpretation_collector.rs:69-148): when a disease block spans
    // >= 2 tables, the block must carry exactly ONE distinct disease,
    // which then applies to the block's gene/variant data from every
    // table.
    val diseaseFactsByBlock = facts.filter(_.kind == FactKinds.DiseaseK).groupBy(_.block)
    def blockDisease(block: String): Option[String] = {
      val inBlock = diseaseFactsByBlock.getOrElse(block, Seq.empty)
      val values = inBlock.flatMap(f => attr(f, "term")).distinct
      val spreadTables = inBlock.map(_.table).distinct.size
      if (spreadTables >= 2 && values.size > 1)
        throw new IllegalStateException(
          s"patient $subject: disease block '$block' spans $spreadTables tables " +
            s"with ${values.size} distinct diseases: ${values.mkString(", ")}")
      values.headOption
    }
    val interpretations = mutable.LinkedHashMap.empty[String, Interpretation]
    facts.filter(_.kind == FactKinds.Interp).foreach { f =>
      val genes = attr(f, "gene").toSeq
      val variants = attr(f, "variants").toSeq.flatMap(_.split("\\|\\|")).filter(_.nonEmpty)
      val diseaseRaw = attr(f, "disease").orElse(blockDisease(f.block))
      if (genes.nonEmpty || variants.nonEmpty) {
        val diseaseTerm = diseaseRaw.map(resolve).getOrElse(
          throw new IllegalStateException(
            s"patient $subject: interpretation block '${f.block}' has gene/variant data but no disease"))
        val interpId = s"$packetId-${diseaseTerm.id}"
        val genomic = GenomicInterpretations.classify(
          subject, genes, variants)
        // Upsert-then-EXTEND (reference upsert_interpretation,
        // phenopacket_builder.rs:352-360): later rows/tables of the same
        // disease add their genomic interpretations, never replace.
        interpretations.get(interpId) match {
          case Some(existing) =>
            val d = existing.diagnosis.get
            interpretations(interpId) = existing.copy(diagnosis =
              Some(d.copy(genomicInterpretations = d.genomicInterpretations ++ genomic)))
          case None =>
            interpretations(interpId) = Interpretation(
              id = interpId,
              progressStatus = "SOLVED",
              diagnosis = Some(Diagnosis(diseaseTerm, genomic)))
        }
      }
    }

    // --- C6/C7: measurements ------------------------------------------
    val measurements = mutable.ArrayBuffer.empty[Measurement]
    facts.filter(_.kind == FactKinds.Quant).foreach { f =>
      (attr(f, "assay"), attr(f, "value")) match {
        case (Some(assay), Some(v)) =>
          // Non-finite doubles would render as invalid JSON downstream —
          // gate at ingest.
          v.toDoubleOption.filter(d => !d.isNaN && !d.isInfinite).foreach { value =>
            val unit = attr(f, "unit").map(resolveLenient)
              .getOrElse(OntoClass("", ""))
            val refRange = (attr(f, "refLow").flatMap(_.toDoubleOption),
              attr(f, "refHigh").flatMap(_.toDoubleOption)) match {
              case (Some(lo), Some(hi)) => Some(ReferenceRange(unit, lo, hi))
              case _                    => None
            }
            measurements += Measurement(
              assay = resolveLenient(assay),
              value = MeasurementValue(quantity =
                Some(Quantity(unit, value, refRange))),
              timeObserved = attr(f, "time").map(timeElement))
          }
        case _ => ()
      }
    }
    facts.filter(_.kind == FactKinds.Qual).foreach { f =>
      (attr(f, "assay"), attr(f, "value")) match {
        case (Some(assay), Some(v)) =>
          measurements += Measurement(
            assay = resolveLenient(assay),
            value = MeasurementValue(ontologyClass = Some(resolve(v))),
            timeObserved = attr(f, "time").map(timeElement))
        case _ => ()
      }
    }

    // --- C8/C9: medical actions ---------------------------------------
    val actions = mutable.ArrayBuffer.empty[MedicalAction]
    facts.filter(_.kind == FactKinds.ProcedureK).foreach { f =>
      attr(f, "code").foreach { code =>
        actions += MedicalAction(
          procedure = Some(ProcedureAction(
            code = resolve(code),
            bodySite = resolveOpt(attr(f, "bodySite")),
            performed = attr(f, "time").map(timeElement))),
          treatmentTarget = resolveOpt(attr(f, "target")),
          treatmentIntent = resolveOpt(attr(f, "intent")),
          responseToTreatment = resolveOpt(attr(f, "response")),
          treatmentTerminationReason = resolveOpt(attr(f, "termination")))
      }
    }
    facts.filter(_.kind == FactKinds.TreatmentK).foreach { f =>
      attr(f, "agent").foreach { agent =>
        // (value, unit) must appear in pairs (reference quantity_data.rs:34-91).
        val dose = (attr(f, "qtyValue").flatMap(_.toDoubleOption), attr(f, "qtyUnit")) match {
          case (Some(v), Some(u)) => Some(Quantity(resolveLenient(u), v))
          case (None, None)       => None
          case (v, u) => throw new IllegalStateException(
            s"patient $subject: quantity value/unit must appear in pairs (value=$v unit=$u)")
        }
        actions += MedicalAction(
          treatment = Some(Treatment(
            agent = resolve(agent),
            routeOfAdministration = resolveOpt(attr(f, "route")),
            drugType = attr(f, "drugType"),
            cumulativeDose = dose)),
          treatmentTarget = resolveOpt(attr(f, "target")),
          treatmentIntent = resolveOpt(attr(f, "intent")),
          responseToTreatment = resolveOpt(attr(f, "response")),
          treatmentTerminationReason = resolveOpt(attr(f, "termination")))
      }
    }

    // --- B6: finalize --------------------------------------------------
    Phenopacket(
      id = packetId,
      subject = individual,
      phenotypicFeatures = (features.values ++ extraFeatures).toSeq,
      measurements = measurements.toSeq,
      diseases = diseaseList.values.toSeq,
      interpretations = interpretations.values.toSeq,
      medicalActions = actions.toSeq,
      metaData = MetaData(
        created = config.created,
        createdBy = config.createdBy,
        resources = resources.values.map(r => MetaResource(
          r.id, r.name, r.url, r.version, r.namespacePrefix, r.iriPrefix)).toSeq))
  }
}

/** C5 gene/variant classification (reference
  * `transform/pathogenic_gene_variant_info.rs:5-106`): (genes, variants)
  * counts map to none / causative-gene / single / homozygous /
  * compound-het; anything else errors.
  */
object GenomicInterpretations {

  /** Structural HGVS validation (offline stand-in for the reference's
    * external HGVS client, phenopacket_builder.rs:297-349):
    * `<reference>:<scheme>.<change>` with a known coordinate scheme.
    */
  private val HgvsRe = "^[A-Za-z][A-Za-z0-9_.]*:[cgmnopr]\\..+$".r
  def isValidHgvs(v: String): Boolean = HgvsRe.findFirstIn(v.trim).isDefined

  def classify(subject: String, genes: Seq[String],
      variants: Seq[String]): Seq[GenomicInterpretation] = {
    variants.filterNot(isValidHgvs) match {
      case Seq() => ()
      case bad => throw new IllegalStateException(
        s"patient $subject: malformed HGVS expression(s): ${bad.mkString(", ")}")
    }
    def geneDescriptor(g: String) = GeneDescriptor(valueId = s"HGNC:$g", symbol = g)
    def variantGi(v: String, allelicState: String): GenomicInterpretation =
      GenomicInterpretation(
        subjectOrBiosampleId = subject,
        interpretationStatus = "CAUSATIVE",
        variantInterpretation = Some(VariantInterpretation(
          acmgPathogenicityClassification = Some("PATHOGENIC"),
          variationDescriptor = Some(VariationDescriptor(
            id = s"variant-$v",
            expressions = Seq(VcfExpression("hgvs", v)),
            allelicState = Some(allelic(allelicState)),
            geneContext = genes.headOption.map(geneDescriptor))))))

    (genes.length, variants.length) match {
      case (0, 0) => Seq.empty
      case (1, 0) => Seq(GenomicInterpretation(
        subjectOrBiosampleId = subject,
        interpretationStatus = "CAUSATIVE",
        gene = Some(geneDescriptor(genes.head))))
      case (0, 1) | (1, 1) => Seq(variantGi(variants.head, "heterozygous"))
      case (0, 2) | (1, 2) =>
        if (variants(0) == variants(1)) Seq(variantGi(variants.head, "homozygous"))
        else variants.map(v => variantGi(v, "heterozygous"))
      case (g, v) => throw new IllegalStateException(
        s"invalid quantity of genes $g and variants $v for patient $subject")
    }
  }

  /** GENO allelic-state terms (public GENO ontology ids). */
  private def allelic(state: String): OntoClass = state match {
    case "homozygous"   => OntoClass("GENO:0000136", "homozygous")
    case "heterozygous" => OntoClass("GENO:0000135", "heterozygous")
    case other          => OntoClass("", other)
  }
}

/** B5 — parse a cell into a protobuf TimeElement: date/datetime →
  * RFC-3339 timestamp; ISO-8601 duration → Age (reference
  * `transform/utils.rs:22-51`).
  */
object TimeParse {
  import java.time.LocalDate
  import java.time.format.DateTimeFormatter

  private val dateFormats = Seq(
    "yyyy-MM-dd", "yyyy.MM.dd", "MM/dd/yyyy", "dd-MM-yyyy", "dd.MM.yyyy",
    "yyyy-M-d", "yyyy.M.d", "M/d/yyyy", "d-M-yyyy", "d.M.yyyy")
  private val IsoDuration =
    ("^P(?!$)(\\d+Y)?(\\d+M)?(\\d+W)?(\\d+D)?" +
      "(T(?=\\d)(\\d+H)?(\\d+M)?(\\d+(\\.\\d+)?S)?)?$").r

  def parseDate(v: String): Option[LocalDate] = {
    val s = v.trim
    if (s.matches("^\\d{4}$")) Some(LocalDate.of(s.toInt, 1, 1))
    else dateFormats.iterator.flatMap { f =>
      try Some(LocalDate.parse(s, DateTimeFormatter.ofPattern(f)))
      catch { case _: Exception => None }
    }.nextOption()
  }

  def toTimestampString(v: String): String =
    parseDate(v).map(d => s"${d}T00:00:00Z").getOrElse(v)

  def parse(v: String): TimeElement = {
    val s = v.trim
    if (IsoDuration.findFirstIn(s).isDefined) TimeElement(age = Some(Age(s)))
    else parseDate(s) match {
      case Some(d) => TimeElement(timestamp = Some(s"${d}T00:00:00Z"))
      case None    => TimeElement(age = Some(Age(s)))
    }
  }
}
