package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of every operator-demonstrating query the engine ships.
  *
  * Each entry pairs a Spark implementation with (where SQL-expressible) an
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet tables.
  * Column names are aliased identically on both sides — the driver's
  * comparator sorts columns by name before hashing.
  */
object Catalog {
  type Q = (SparkSession, String) => DataFrame

  final case class Entry(name: String, q: Q, oracle: Option[String])

  def all: Seq[Entry] =
    Relational.entries ++ EtlScalarOps.entries ++ StrategyOps.entries ++
      GroupingOps.entries ++ TextOps.entries ++ DedupOps.entries ++
      SimilarityOps.entries ++ MultimodalOps.entries ++ EtlAssembly.entries ++
      TemporalOps.entries ++ PipelineOps.entries ++ CorpusOps.entries ++
      UrlCurationOps.entries ++ WebTextOps.entries ++ WarcOps.entries ++
      LinkGraphOps.entries

  lazy val queries: Map[String, Q] = {
    val names = all.map(_.name)
    val dupes = names.diff(names.distinct)
    require(dupes.isEmpty, s"duplicate query names in catalog: ${dupes.mkString(", ")}")
    all.map(e => e.name -> e.q).toMap
  }
  lazy val oracleSql: Map[String, String] =
    all.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
