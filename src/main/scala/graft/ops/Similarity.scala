package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * Scale design (100 TB stance):
  *  - the query set is always the broadcast side — the corpus is never
  *    collected or replicated;
  *  - brute-force top-k is the exact baseline: one pass over the corpus
  *    per query batch, per-partition top-k via window row_number
  *    (TakeOrdered-style), linear in corpus size;
  *  - the LSH path buckets the corpus by random-hyperplane sign bits so
  *    each query only scans its bucket — the candidate scan shrinks by
  *    ~2^bits while the dot products stay identical; recall is tunable
  *    via number of tables/bits. Hyperplanes are derived deterministically
  *    from xxhash64(seed, dim) so plans are reproducible across runs;
  *  - all vector math is codegen'd higher-order column algebra
  *    (zip_with + aggregate), computed in double.
  */
object Similarity {

  /** Dot product of two array<double> columns (sequential fold — stable
    * summation order, reproducible across engines).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k.
    * `queries`: (qid, qvec array<double>) — small, broadcast.
    * `corpus`: (id, vec array<double>).
    * Returns (query_id, neighbor_id, cos_sim) — k rows per query,
    * self-match excluded, ties broken by neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(broadcast(queries.select(
        col(qidCol).as("query_id"), col(qvecCol).cast("array<double>").as("__q"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__v"), col("__q")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic pseudo-random hyperplane component for (seed, dim):
    * xxhash64 scaled into [-1, 1]. Good enough for sign-LSH; no RNG
    * state, identical on every executor.
    */
  private def planeComponent(seed: Int, dim: Column): Column =
    (xxhash64(lit(seed), dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-bit LSH bucket id for a vector: `bits` hyperplane signs packed
    * into a long.
    */
  def lshBucket(vec: Column, bits: Int, seed: Int): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(vec, dims, (x, d) => x * planeComponent(seed * 31 + b, d)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
  }

  /** IVF (inverted-file) ANN top-k: the corpus is partitioned into
    * `nlist` cells around coarse centroids; each query scans only its
    * `nprobe` nearest cells.
    *
    * Centroids here are a deterministic pseudo-random corpus sample
    * (nlist vectors with the smallest xxhash64(id)) — one k-means
    * refinement sweep is the natural upgrade but does not change the
    * operator shape. At 100 TB the cell assignment is computed once at
    * ingest and stored as a partition column so query-time work is
    * `nprobe/nlist` of the corpus; here assignment happens inline.
    * Exact distances within probed cells (like FAISS IVF-Flat).
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.Row
    require(nprobe <= nlist, "nprobe must be <= nlist")
    val c0 = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__v"))
    // Coarse centroids: deterministic sample, driver-sized (nlist × dim).
    val centroids: Array[(Int, Array[Double])] = c0
      .withColumn("__h", xxhash64(col("neighbor_id")))
      .orderBy(col("__h")).limit(nlist)
      .select(col("__v")).collect()
      .zipWithIndex.map { case (r: Row, i) => (i, r.getSeq[Double](0).toArray) }

    def nearestCells(vec: Column, n: Int): Column = {
      // array_min over (negCos, cellId) structs sorts by similarity;
      // slice after sort_array gives the n best cells.
      val scored = array(centroids.map { case (i, cv) =>
        struct((-cosine(vec, lit(cv))).as("d"), lit(i).as("cell"))
      }: _*)
      slice(sort_array(scored), 1, n)
    }

    val assigned = c0.withColumn("__cell",
      nearestCells(col("__v"), 1).getItem(0).getField("cell"))
    val q = broadcast(queries
      .select(col(qidCol).as("query_id"), col(qvecCol).cast("array<double>").as("__q"))
      .withColumn("__probe", explode(nearestCells(col("__q"), nprobe)))
      .select(col("query_id"), col("__q"), col("__probe.cell").as("__cell")))

    val scored = assigned.join(q, "__cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__v"), col("__q")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Bucketed ANN top-k: queries only compare against corpus vectors in
    * the same LSH bucket (single table). Returns the same shape as
    * bruteForceTopK; recall < 1 by construction.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, bits: Int = 8, seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__bucket", lshBucket(col("__v"), bits, seed))
    val q = broadcast(queries.select(col(qidCol).as("query_id"),
      col(qvecCol).cast("array<double>").as("__q"))
      .withColumn("__bucket", lshBucket(col("__q"), bits, seed)))
    val scored = c.join(q, "__bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__v"), col("__q")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
