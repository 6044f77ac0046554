package graft.collect

import graft.model._
import graft.strategy.MultiHpoColExpansionStrategy
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One normalized row of per-patient evidence, extracted from a
  * contextualized table. The union of all tables' facts is THE single
  * shuffle of the pipeline: `groupByKey(subject)` feeds the assembly
  * aggregator (reference G1/G2,
  * `transform/collecting/cdf_collector_broker.rs:36-91` — which instead
  * materializes one sub-DataFrame per patient, its main scalability
  * cliff; here patients stay distributed).
  *
  * `seq` preserves source row order within a table so order-sensitive
  * dedup (`unique_stable`, reference `collecting/utils.rs:44-48`)
  * stays deterministic.
  */
final case class Fact(
    subject: String,
    table: String,
    seq: Long,
    block: String, // building block id, "" = none
    kind: String,  // individual | hpo_cell | hpo_header | disease | quant | qual | procedure | treatment | interp
    attrs: Map[String, String])

object Facts {

  import FactKinds._

  /** Extract all facts of one contextualized table: a narrow projection
    * (select + explode), no shuffle. Column→fact planning happens
    * driver-side from the table context; cell work is codegen'd.
    */
  def extract(cdf: Cdf): Dataset[Fact] = {
    val spark = cdf.df.sparkSession
    import spark.implicits._

    val subject = cdf.subjectIdColumn
    val factCols = factStructs(cdf)
    if (factCols.isEmpty) return spark.emptyDataset[Fact]

    cdf.df
      .withColumn("__seq", monotonically_increasing_id())
      .select(
        col(subject).cast("string").as("subject"),
        lit(cdf.context.name).as("table"),
        col("__seq").as("seq"),
        explode(array(factCols: _*)).as("f"))
      .select(col("subject"), col("table"), col("seq"),
        col("f.block").as("block"), col("f.kind").as("kind"),
        map_filter(col("f.attrs"), (_, v) => v.isNotNull).as("attrs"))
      .filter(size(map_keys(col("attrs"))) > 0)
      .as[Fact]
  }

  /** Union the facts of every table (narrow union, preserves
    * partitioning of each input).
    */
  def extractAll(tables: Seq[Cdf]): Dataset[Fact] = {
    require(tables.nonEmpty,
      "fact extraction needs at least one table — no data sources were configured/loaded")
    tables.map(extract).reduce(_ unionByName _)
  }

  // ------------------------------------------------------------------

  private def s(c: String) = col(c).cast("string")

  private def factStructs(cdf: Cdf): Seq[org.apache.spark.sql.Column] = {
    val b = cdf.bindings

    def blockOf(sc: SeriesContext): String = sc.buildingBlockId.getOrElse("")
    def linked(block: Option[String], kinds: ContextKind*): Option[String] =
      cdf.singleLinkedColumn(block, kinds.toSet)
    def timeKindOf(c: Context): String = c match {
      case Context.Onset(t)               => tk(t)
      case Context.TimeOfDeath(t)         => tk(t)
      case Context.TimeAtLastEncounter(t) => tk(t)
      case Context.TimeOfResolution(t)    => tk(t)
      case Context.TimeOfMeasurement(t)   => tk(t)
      case Context.TimeOfProcedure(t)     => tk(t)
      case _                              => "age"
    }
    def tk(t: TimeKind): String = t match {
      case TimeKind.Age  => "age"
      case TimeKind.Date => "date"
    }

    def mk(kind: String, block: String, attrs: (String, org.apache.spark.sql.Column)*) = {
      val kv = attrs.flatMap { case (k, v) => Seq(lit(k), v.cast("string")) }
      struct(lit(block).as("block"), lit(kind).as("kind"),
        map(kv: _*).as("attrs"))
    }

    val individual = b.collect {
      case (c, sc) if sc.headerContext == Context.NoContext =>
        sc.dataContext match {
          case Context.SubjectSex =>
            Some(mk(Individual_, blockOf(sc), "field" -> lit("sex"), "value" -> s(c)))
          case Context.DateOfBirth =>
            Some(mk(Individual_, blockOf(sc), "field" -> lit("dateOfBirth"), "value" -> s(c)))
          case Context.VitalStatus =>
            Some(mk(Individual_, blockOf(sc), "field" -> lit("vitalStatus"), "value" -> s(c)))
          case Context.CauseOfDeath =>
            Some(mk(Individual_, blockOf(sc), "field" -> lit("causeOfDeath"), "value" -> s(c)))
          case Context.SurvivalTimeDays =>
            Some(mk(Individual_, blockOf(sc), "field" -> lit("survivalTimeInDays"), "value" -> s(c)))
          case t @ Context.TimeAtLastEncounter(_) =>
            Some(mk(Individual_, blockOf(sc), "field" -> lit("timeAtLastEncounter"),
              "value" -> s(c), "tkind" -> lit(timeKindOf(t))))
          case t @ Context.TimeOfDeath(_) =>
            Some(mk(Individual_, blockOf(sc), "field" -> lit("timeOfDeath"),
              "value" -> s(c), "tkind" -> lit(timeKindOf(t))))
          case _ => None
        }
    }.flatten

    val hpoCells = b.collect {
      case (c, sc) if sc.dataContext.kind == ContextKind.KHpo &&
          sc.headerContext == Context.NoContext =>
        val blk = sc.buildingBlockId
        val onsetCol = linked(blk, ContextKind.KOnset)
        val resolutionCol = linked(blk, ContextKind.KTimeOfResolution)
        val severityCol = linked(blk, ContextKind.KSeverity)
        val obsCol = linked(blk, ContextKind.KObservationStatus)
        mk(HpoCell, blockOf(sc),
          "hpo" -> s(c),
          "onset" -> onsetCol.map(s).getOrElse(lit(null)),
          "resolution" -> resolutionCol.map(s).getOrElse(lit(null)),
          "severity" -> severityCol.map(s).getOrElse(lit(null)),
          "observed" -> obsCol.map(s).getOrElse(lit(null)))
    }

    val hpoHeaders = b.collect {
      // Reference collects header=Hpo columns whose CELLS are
      // observation statuses (hpo_in_header_collector) — a header=Hpo
      // column with some other data context is not an observation grid.
      case (c, sc) if sc.headerContext.kind == ContextKind.KHpo &&
          sc.dataContext.kind == ContextKind.KObservationStatus =>
        val (hpoId, blockFromHeader) = MultiHpoColExpansionStrategy.decodeHeader(c)
        val blk = sc.buildingBlockId.orElse(blockFromHeader)
        val onsetCol = cdf.singleLinkedColumn(blk, Set(ContextKind.KOnset))
        mk(HpoHeader, blk.getOrElse(""),
          "hpo" -> lit(hpoId),
          "observed" -> s(c),
          "onset" -> onsetCol.map(s).getOrElse(lit(null)))
    }

    val diseases = b.collect {
      case (c, sc) if sc.dataContext.kind == ContextKind.KDisease &&
          sc.headerContext == Context.NoContext =>
        val blk = sc.buildingBlockId
        mk(DiseaseK, blockOf(sc),
          "term" -> s(c),
          "onset" -> linked(blk, ContextKind.KOnset).map(s).getOrElse(lit(null)),
          "resolution" -> linked(blk, ContextKind.KTimeOfResolution).map(s).getOrElse(lit(null)),
          "primarySite" -> linked(blk, ContextKind.KPrimarySite).map(s).getOrElse(lit(null)))
    }

    val quants = b.collect {
      case (c, sc) if sc.dataContext.kind == ContextKind.KQuantitativeMeasurement =>
        val Context.QuantitativeMeasurement(assay, unit) = sc.dataContext: @unchecked
        val blk = sc.buildingBlockId
        mk(Quant, blockOf(sc),
          "assay" -> lit(assay), "unit" -> lit(unit), "value" -> s(c),
          "time" -> linked(blk, ContextKind.KTimeOfMeasurement).map(s).getOrElse(lit(null)),
          "refLow" -> linked(blk, ContextKind.KReferenceRangeStart).map(s).getOrElse(lit(null)),
          "refHigh" -> linked(blk, ContextKind.KReferenceRangeEnd).map(s).getOrElse(lit(null)))
    }

    val quals = b.collect {
      case (c, sc) if sc.dataContext.kind == ContextKind.KQualitativeMeasurement =>
        val Context.QualitativeMeasurement(assay) = sc.dataContext: @unchecked
        val blk = sc.buildingBlockId
        mk(Qual, blockOf(sc),
          "assay" -> lit(assay), "value" -> s(c),
          "time" -> linked(blk, ContextKind.KTimeOfMeasurement).map(s).getOrElse(lit(null)))
    }

    val procedures = b.collect {
      case (c, sc) if sc.dataContext.kind == ContextKind.KProcedure =>
        val blk = sc.buildingBlockId
        mk(ProcedureK, blockOf(sc),
          "code" -> s(c),
          "bodySite" -> linked(blk, ContextKind.KProcedureBodySite).map(s).getOrElse(lit(null)),
          "time" -> linked(blk, ContextKind.KTimeOfProcedure).map(s).getOrElse(lit(null)),
          "target" -> linked(blk, ContextKind.KTreatmentTarget).map(s).getOrElse(lit(null)),
          "intent" -> linked(blk, ContextKind.KTreatmentIntent).map(s).getOrElse(lit(null)),
          "response" -> linked(blk, ContextKind.KResponseToTreatment).map(s).getOrElse(lit(null)),
          "termination" -> linked(blk, ContextKind.KTreatmentTerminationReason).map(s).getOrElse(lit(null)))
    }

    val treatments = b.collect {
      case (c, sc) if sc.dataContext.kind == ContextKind.KTreatmentAgent =>
        val blk = sc.buildingBlockId
        mk(TreatmentK, blockOf(sc),
          "agent" -> s(c),
          "route" -> linked(blk, ContextKind.KRouteOfAdministration).map(s).getOrElse(lit(null)),
          "drugType" -> linked(blk, ContextKind.KDrugType).map(s).getOrElse(lit(null)),
          "qtyValue" -> linked(blk, ContextKind.KQuantityValue).map(s).getOrElse(lit(null)),
          "qtyUnit" -> linked(blk, ContextKind.KQuantityUnit).map(s).getOrElse(lit(null)),
          "target" -> linked(blk, ContextKind.KTreatmentTarget).map(s).getOrElse(lit(null)),
          "intent" -> linked(blk, ContextKind.KTreatmentIntent).map(s).getOrElse(lit(null)),
          "response" -> linked(blk, ContextKind.KResponseToTreatment).map(s).getOrElse(lit(null)),
          "termination" -> linked(blk, ContextKind.KTreatmentTerminationReason).map(s).getOrElse(lit(null)))
    }

    // Interpretation evidence: gene + variant columns grouped by block;
    // the disease term of the same block rides along for diagnosis
    // assembly (reference `interpretation_collector.rs:16-196`).
    // Only NAMED building blocks form interpretations (reference
    // filters where_building_block(IsSome) — block-less genetics
    // columns are never married to unrelated diseases).
    val interpBlocks = b.collect {
      case (_, sc) if (sc.dataContext.kind == ContextKind.KHgnc ||
          sc.dataContext.kind == ContextKind.KHgvs) &&
          sc.buildingBlockId.isDefined => sc.buildingBlockId
    }.distinct
    val interps = interpBlocks.map { blk =>
      val geneCol = linked(blk, ContextKind.KHgnc)
      val hgvsCols = cdf.bindings.collect {
        case (c2, sc2) if sc2.buildingBlockId == blk &&
          sc2.dataContext.kind == ContextKind.KHgvs => c2
      }
      val diseaseCol = linked(blk, ContextKind.KDisease)
      val variantsExpr =
        if (hgvsCols.isEmpty) lit(null)
        else concat_ws("||", hgvsCols.map(s): _*)
      mk(Interp, blk.getOrElse(""),
        "gene" -> geneCol.map(s).getOrElse(lit(null)),
        "variants" -> variantsExpr,
        "disease" -> diseaseCol.map(s).getOrElse(lit(null)))
    }

    individual ++ hpoCells ++ hpoHeaders ++ diseases ++ quants ++ quals ++
      procedures ++ treatments ++ interps
  }
}

object FactKinds {
  val Individual_ = "individual"
  val HpoCell = "hpo_cell"
  val HpoHeader = "hpo_header"
  val DiseaseK = "disease"
  val Quant = "quant"
  val Qual = "qual"
  val ProcedureK = "procedure"
  val TreatmentK = "treatment"
  val Interp = "interp"
}
