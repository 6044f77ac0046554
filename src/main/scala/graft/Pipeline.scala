package graft

import graft.clean.Preprocessor
import graft.collect.{Assembler, AssemblerConfig, Facts, Phenopacket}
import graft.load.FileSystemLoader
import graft.model.Cdf
import graft.ontology.BiDictLibrary
import graft.strategy.Strategy
import org.apache.spark.sql.Dataset

/** The Extract → Transform (preprocess → strategies → collect) → Load
  * pipeline (reference `phenoxtract/src/pipeline.rs:36-85`,
  * `transform/transform_module.rs:26-43`).
  *
  * Strategies see ALL tables at once (cross-table DOB maps); the
  * preprocess/strategy stages are lazy column rewrites — nothing
  * materializes until the single groupByKey shuffle in `collect`.
  */
final case class Pipeline(
    strategies: Seq[Strategy],
    library: BiDictLibrary,
    assembler: AssemblerConfig,
    hgvs: graft.ontology.HgvsResolver = graft.ontology.HgvsResolver.empty,
    resolver: Option[graft.ontology.TermResolver] = None) {

  def transform(tables: Seq[Cdf]): Dataset[Phenopacket] = {
    val preprocessed = tables.map(Preprocessor.process)
    val transformed = strategies.foldLeft(preprocessed) { (ts, strategy) =>
      if (strategy.isValid(ts)) strategy.transform(ts) else ts
    }
    val facts = Facts.extractAll(transformed)
    Assembler.assemble(facts, library, assembler, hgvs, resolver)
  }

  def run(tables: Seq[Cdf], outDir: String): Unit =
    FileSystemLoader.load(transform(tables), outDir)
}
