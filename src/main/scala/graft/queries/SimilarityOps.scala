package graft.queries

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Embedding similarity-search queries. Brute-force cosine top-k is the
  * exact baseline and is DuckDB-oracle-checked (list_cosine_similarity);
  * the LSH-bucketed variant is the scale path and gets a rows-only
  * check plus recall assertions in its spec.
  */
object SimilarityOps {
  import Catalog.{Entry, Q}

  private def queriesDf(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings").filter(col("vec_id") < 3)

  private val brute: Q = (s, dir) =>
    Similarity.bruteForceTopK(
      Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
      queriesDf(s, dir), "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"), round(col("cos_sim"), 5).as("cos_sim"))

  private val bruteSql =
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id < 3),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cs
      |  FROM embeddings e CROSS JOIN q
      |  WHERE e.vec_id <> q.query_id)
      |SELECT query_id, neighbor_id, round(cs, 5) AS cos_sim
      |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |                                   ORDER BY cs DESC, neighbor_id) AS rn
      |      FROM scored) t
      |WHERE rn <= 5""".stripMargin

  private val lsh: Q = (s, dir) =>
    Similarity.lshTopK(
      Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
      queriesDf(s, dir), "vec_id", "embedding", k = 5, bits = 4)
      .select(col("query_id"), col("neighbor_id"), round(col("cos_sim"), 5).as("cos_sim"))

  private val ivf: Q = (s, dir) =>
    Similarity.ivfTopK(
      Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
      queriesDf(s, dir), "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"), round(col("cos_sim"), 5).as("cos_sim"))

  val entries: Seq[Entry] = Seq(
    Entry("ann_brute_topk", brute, Some(bruteSql)),
    Entry("ann_lsh_topk", lsh, None),
    Entry("ann_ivf_topk", ivf, None),
  )
}
