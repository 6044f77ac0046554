package graft.queries

import graft.Tables
import graft.collect.{Assembler, AssemblerConfig, Facts}
import graft.model._
import graft.ontology.{BiDict, BiDictLibrary, Resource}
import graft.strategy.MappingStrategy
import org.apache.spark.sql.functions._

/** The document-assembly pipeline (G1/G2 + collectors) run over the
  * driver testdata at harness scale: customers become subjects, their
  * orders' priorities become ontology-resolved "phenotype" terms. This
  * exercises the REAL fact-extraction → groupByKey → Assembler path —
  * and its observable outputs (sex mapping, per-packet feature count
  * from term upserts) are plain SQL, so the DuckDB oracle checks the
  * assembly semantics end-to-end.
  */
object EtlAssembly {
  import Catalog.{Entry, Q}

  private val priorityDict = BiDict.fromEntries(
    Resource("pri", "order priorities", "urn:graft:pri", "1", "PRI", "urn:graft:pri:"),
    Seq(
      ("PRI:1", "1-URGENT", Seq.empty),
      ("PRI:2", "2-HIGH", Seq.empty),
      ("PRI:3", "3-MEDIUM", Seq.empty),
      ("PRI:4", "4-NOT SPECIFIED", Seq.empty),
      ("PRI:5", "5-LOW", Seq.empty)))
  private val library = BiDictLibrary(Seq(priorityDict))

  private val segmentSex = MappingStrategy(
    "segment_sex",
    Map(
      "building" -> "MALE", "automobile" -> "FEMALE", "machinery" -> "OTHER_SEX",
      "household" -> "UNKNOWN_SEX", "furniture" -> "MALE"),
    ContextKind.KSubjectSex)

  private val etl: Q = (s, dir) => {
    val customers = Cdf.validated(
      TableContext("customers", Seq(
        SeriesContext(Identifier.Single("c_custkey"), dataContext = Context.SubjectId),
        SeriesContext(Identifier.Single("c_mktsegment"), dataContext = Context.SubjectSex))),
      Tables.load(s, dir, "customer")
        .select(col("c_custkey").cast("string").as("c_custkey"), col("c_mktsegment")))
    val orders = Cdf.validated(
      TableContext("orders", Seq(
        SeriesContext(Identifier.Single("o_custkey"), dataContext = Context.SubjectId),
        SeriesContext(Identifier.Single("o_orderpriority"), dataContext = Context.Hpo,
          buildingBlockId = Some("O")))),
      Tables.load(s, dir, "orders")
        .select(col("o_custkey").cast("string").as("o_custkey"), col("o_orderpriority")))

    val mapped = segmentSex.transform(Seq(customers, orders))
    val packets = Assembler.assemble(
      Facts.extractAll(mapped), library, AssemblerConfig(cohort = "tpch"))
    packets.toDF().select(
      col("subject.id").cast("long").as("subject_id"),
      col("subject.sex").as("sex"),
      size(col("phenotypicFeatures")).as("n_features"))
  }

  private val etlSql =
    """SELECT c_custkey AS subject_id,
      |  CASE lower(trim(c_mktsegment))
      |    WHEN 'building' THEN 'MALE' WHEN 'automobile' THEN 'FEMALE'
      |    WHEN 'machinery' THEN 'OTHER_SEX' WHEN 'household' THEN 'UNKNOWN_SEX'
      |    WHEN 'furniture' THEN 'MALE' END AS sex,
      |  (SELECT count(DISTINCT o_orderpriority) FROM orders
      |   WHERE o_custkey = c_custkey) AS n_features
      |FROM customer""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("etl_assembly", etl, Some(etlSql)))
}
