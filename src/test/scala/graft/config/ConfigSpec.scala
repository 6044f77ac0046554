package graft.config

import graft.SparkSpec
import graft.model._

import java.nio.file.Files

/** Config decode + env expansion + config-driven end-to-end run. */
class ConfigSpec extends SparkSpec {

  private def write(dir: java.nio.file.Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("yaml decode: sources, contexts, alias maps, strategies, metadata") {
    val dir = Files.createTempDirectory("graftcfg")
    write(dir, "aliases.csv", "KEYS,ALIASES\nM,MALE\nF,FEMALE\nNo data,\n")
    write(dir, "hp_terms.csv", "id,label,synonyms\nHP:0001945,Fever,febrile|pyrexia\n")
    write(dir, "data.csv", "Patient ID,Sex,Phenotypes,Onset\nP001,M,Fever,12\n")
    val cfgPath = write(dir, "config.yaml",
      s"""data_sources:
         |  - type: "csv"
         |    source: "${dir.resolve("data.csv")}"
         |    has_headers: true
         |    patients_are_rows: true
         |    series_contexts:
         |      - identifier: "Patient ID"
         |        data_context: subject_id
         |      - identifier: "Sex"
         |        data_context: subject_sex
         |        alias_map:
         |          output_data_type: String
         |          mappings:
         |            path: "aliases.csv"
         |            key_column_name: "KEYS"
         |            alias_column_name: "ALIASES"
         |      - identifier: "Phenotypes"
         |        data_context: hpo
         |        building_block_id: "P"
         |      - identifier: "Onset"
         |        data_context:
         |          onset: age
         |        building_block_id: "P"
         |pipeline:
         |  strategies:
         |    - "alias_map"
         |    - "age_to_iso8601"
         |    - "ontology_normaliser"
         |  loader:
         |    file_system:
         |      output_dir: "${dir.resolve("out")}"
         |      create_dir: true
         |  meta_data:
         |    created_by: "$${GRAFT_TEST_USER}"
         |    cohort_name: "c1"
         |    hpo_resource:
         |      id: "hp"
         |      version: "2024-01-01"
         |      namespace_prefix: "HP"
         |      terms_file: "${dir.resolve("hp_terms.csv")}"
         |""".stripMargin)

    // env expansion: ${GRAFT_TEST_USER} is not set → error
    intercept[IllegalArgumentException] { ConfigLoader.load(cfgPath) }

    // with the var provided via expandEnv on a patched string
    val raw = Files.readString(java.nio.file.Paths.get(cfgPath))
      .replace("${GRAFT_TEST_USER}", "tester")
    val patched = write(dir, "config2.yaml", raw)
    val cfg = ConfigLoader.load(patched)

    assert(cfg.csvSources.size == 1)
    val sc = cfg.csvSources.head.tableContext.seriesContexts
    assert(sc(0).dataContext == Context.SubjectId)
    assert(sc(1).aliasMap.get.entries == Map(
      "M" -> Some("MALE"), "F" -> Some("FEMALE"), "No data" -> None))
    assert(sc(3).dataContext == Context.Onset(TimeKind.Age))
    assert(cfg.strategies.map(_.name) ==
      Seq("alias_map", "age_to_iso8601", "ontology_normaliser"))
    assert(cfg.metaData.createdBy == "tester")
    assert(cfg.metaData.resources.head.id == "hp")

    // full config-driven run → packet on disk
    ConfigRunner.run(spark, patched)
    val out = dir.resolve("out").toFile.list().toSeq
    assert(out == Seq("c1-P001.json"))
    val json = Files.readString(dir.resolve("out/c1-P001.json"))
    assert(json.contains("\"sex\": \"MALE\""))
    assert(json.contains("HP:0001945"))
    assert(json.contains("\"iso8601duration\": \"P12Y\""))
    assert(json.contains("\"createdBy\": \"tester\""))
  }

  test("TOML decode round-trips the same config as YAML (reference config_loader.rs:8-44)") {
    val dir = Files.createTempDirectory("grafttoml")
    write(dir, "hp_terms.csv", "id,label,synonyms\nHP:0001945,Fever,febrile|pyrexia\n")
    write(dir, "data.csv", "Patient ID,Sex,Phenotypes,Onset\nP001,M,Fever,12\n")
    val yamlPath = write(dir, "config.yaml",
      s"""data_sources:
         |  - type: csv
         |    source: "${dir.resolve("data.csv")}"
         |    series_contexts:
         |      - identifier: "Patient ID"
         |        data_context: subject_id
         |      - identifier: "Sex"
         |        data_context: subject_sex
         |        alias_map:
         |          output_data_type: string
         |          mappings:
         |            M: MALE
         |            F: FEMALE
         |      - identifier: "Onset"
         |        data_context:
         |          onset: age
         |        building_block_id: "P"
         |pipeline:
         |  strategies: ["alias_map", "age_to_iso8601"]
         |  loader:
         |    file_system:
         |      output_dir: "${dir.resolve("out")}"
         |      create_dir: true
         |  meta_data:
         |    created_by: "tester"
         |    cohort_name: "c1"
         |    hpo_resource:
         |      id: "hp"
         |      version: "2024-01-01"
         |      namespace_prefix: "HP"
         |      terms_file: "${dir.resolve("hp_terms.csv")}"
         |""".stripMargin)
    val tomlPath = write(dir, "config.toml",
      s"""[[data_sources]]
         |type = "csv"
         |source = "${dir.resolve("data.csv")}"
         |
         |[[data_sources.series_contexts]]
         |identifier = "Patient ID"
         |data_context = "subject_id"
         |
         |[[data_sources.series_contexts]]
         |identifier = "Sex"
         |data_context = "subject_sex"
         |alias_map = { output_data_type = "string", mappings = { M = "MALE", F = "FEMALE" } }
         |
         |[[data_sources.series_contexts]]
         |identifier = "Onset"
         |data_context = { onset = "age" }
         |building_block_id = "P"
         |
         |[pipeline]
         |strategies = ["alias_map", "age_to_iso8601"]
         |
         |[pipeline.loader.file_system]
         |output_dir = "${dir.resolve("out")}"
         |create_dir = true
         |
         |[pipeline.meta_data]
         |created_by = "tester"
         |cohort_name = "c1"
         |
         |[pipeline.meta_data.hpo_resource]
         |id = "hp"
         |version = "2024-01-01"
         |namespace_prefix = "HP"
         |terms_file = "${dir.resolve("hp_terms.csv")}"
         |""".stripMargin)
    val fromYaml = ConfigLoader.load(yamlPath)
    val fromToml = ConfigLoader.load(tomlPath)
    assert(fromToml.csvSources == fromYaml.csvSources)
    assert(fromToml.metaData == fromYaml.metaData)
    assert(fromToml.strategies.map(_.name) == fromYaml.strategies.map(_.name))
    assert(fromToml.loader == fromYaml.loader)

    val ronPath = write(dir, "config.ron",
      s"""// RON flavor of the same pipeline config
         |(
         |  data_sources: [
         |    (
         |      type: csv,
         |      source: "${dir.resolve("data.csv")}",
         |      series_contexts: [
         |        (identifier: "Patient ID", data_context: subject_id),
         |        (
         |          identifier: "Sex",
         |          data_context: subject_sex,
         |          alias_map: (
         |            output_data_type: string,
         |            mappings: { "M": "MALE", "F": "FEMALE" },
         |          ),
         |        ),
         |        (
         |          identifier: "Onset",
         |          data_context: (onset: age),
         |          building_block_id: Some("P"),
         |        ),
         |      ],
         |    ),
         |  ],
         |  pipeline: (
         |    strategies: ["alias_map", "age_to_iso8601"],
         |    loader: (file_system: (
         |      output_dir: "${dir.resolve("out")}",
         |      create_dir: true,
         |    )),
         |    meta_data: (
         |      created_by: "tester",
         |      cohort_name: "c1",
         |      hpo_resource: (
         |        id: "hp",
         |        version: "2024-01-01",
         |        namespace_prefix: "HP",
         |        terms_file: "${dir.resolve("hp_terms.csv")}",
         |      ),
         |    ),
         |  ),
         |)
         |""".stripMargin)
    val fromRon = ConfigLoader.load(ronPath)
    assert(fromRon.csvSources == fromYaml.csvSources)
    assert(fromRon.metaData == fromYaml.metaData)
    assert(fromRon.strategies.map(_.name) == fromYaml.strategies.map(_.name))
    assert(fromRon.loader == fromYaml.loader)
  }

  test("pipeline.resolver block gates a reflective live-resolver stack") {
    val dir = Files.createTempDirectory("graftcfg")
    val cfgPath = write(dir, "r.yaml",
      """data_sources: []
        |pipeline:
        |  strategies: []
        |  resolver:
        |    class: "graft.ontology.StubRemoteResolver"
        |    cache_size: 64
        |    rate_limit_per_sec: 1000
        |  meta_data:
        |    cohort_name: "c1"
        |""".stripMargin)
    val cfg = ConfigLoader.load(cfgPath)
    assert(cfg.resolver == Some(ConfigLoader.ResolverConfig(
      "graft.ontology.StubRemoteResolver", 64, Some(1000.0))))
    val stack = ConfigRunner.buildResolver(cfg, ConfigRunner.buildLibrary(cfg)).get
    assert(stack.resolveIn("hpo", "remote-only term").map(_._1.id) == Some("RT:1"))
    // no resolver block → offline default (None: assembly builds it)
    val plain = write(dir, "p.yaml",
      "data_sources: []\npipeline:\n  strategies: []\n  meta_data:\n    cohort_name: \"c\"\n")
    assert(ConfigLoader.load(plain).resolver.isEmpty)
  }

  test("parameterized quantitative context decodes") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val node = mapper.readTree(
      """quantitative_measurement:
        |  assay_id: "LOINC:8302-2"
        |  unit_ontology_id: "UO:0000015"
        |""".stripMargin)
    assert(ConfigLoader.context(node) ==
      Context.QuantitativeMeasurement("LOINC:8302-2", "UO:0000015"))
  }

  test("alias csv: quoted commas stay in one field; short rows fail with the row number") {
    val dir = Files.createTempDirectory("graftcfg")
    val p = write(dir, "a.csv",
      "k,v\n\"Smith, John\",alias1\nplain,alias2\n")
    val m = ConfigLoader.loadAliasCsv(p, "k", "v")
    assert(m === Map("Smith, John" -> Some("alias1"), "plain" -> Some("alias2")))

    val short = write(dir, "b.csv", "a,b,k\nx,y,key1\nx\n")
    val e = intercept[IllegalArgumentException] {
      ConfigLoader.loadAliasCsv(short, "k", "b")
    }
    assert(e.getMessage.contains("row 3"), e.getMessage)
  }

  test("terms csv: quoted comma-containing labels survive; mixed sources keep config order") {
    val dir = Files.createTempDirectory("graftcfg")
    val p = write(dir, "terms.csv",
      "id,label,synonyms\nHP:0001250,\"Seizure, generalized\",fits|convulsions\n")
    val terms = ConfigRunner.loadTerms(p)
    assert(terms == Seq(("HP:0001250", "Seizure, generalized",
      Seq("fits", "convulsions"))))

    // a mixed excel-then-csv config must keep data_sources order in the
    // decoded ordinals (fact provenance sorts by registration order)
    write(dir, "d.csv", "Patient ID\nP001\n")
    val cfgPath = write(dir, "mixed.yaml",
      s"""data_sources:
         |  - type: "excel"
         |    source: "${dir.resolve("x.xlsx")}"
         |    sheets: []
         |  - type: "csv"
         |    source: "${dir.resolve("d.csv")}"
         |    series_contexts:
         |      - identifier: "Patient ID"
         |        context: "SubjectId"
         |pipeline:
         |  strategies: []
         |  loader:
         |    file_system:
         |      output_dir: "${dir.resolve("out")}"
         |""".stripMargin)
    val cfg = ConfigLoader.load(cfgPath)
    assert(cfg.excelSources.map(_.ordinal) == Seq(0))
    assert(cfg.csvSources.map(_.ordinal) == Seq(1))
  }

  test("explicitly-null config booleans fall back to the declared default") {
    val dir = Files.createTempDirectory("graftcfg")
    write(dir, "data.csv", "Patient ID\nP001\n")
    // "has_headers:" with an empty value parses to YAML null — it must
    // keep the default (true), not flip to asBoolean's false and
    // ingest the header row as a patient
    val cfgPath = write(dir, "config.yaml",
      s"""data_sources:
         |  - type: "csv"
         |    source: "${dir.resolve("data.csv")}"
         |    has_headers:
         |    patients_are_rows: true
         |    series_contexts:
         |      - identifier: "Patient ID"
         |        data_context: subject_id
         |pipeline:
         |  strategies: []
         |  loader:
         |    file_system:
         |      output_dir: "${dir.resolve("out")}"
         |  meta_data:
         |    created_by: "tester"
         |""".stripMargin)
    val cfg = ConfigLoader.load(cfgPath)
    assert(cfg.csvSources.head.hasHeaders === true)
  }
}
