package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are populated from `graft.queries.Catalog`,
  * which registers one entry per implemented operator from SURVEY.md §2
  * plus the training-data-pipeline surface (dedup / similarity / text /
  * multimodal).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full multi-join revenue rollup (scan → broadcast dims →
    * shuffle join → hash agg).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (probabilistic/hash-seeded) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Catalog.oracleSql
}
