package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack/Clarke/Buettcher's RRF) of several
  * per-system rankings into one list — the standard way to combine a
  * lexical (BM25) and a dense (embedding ANN) retriever in a hybrid
  * search or retrieval-based data-selection pipeline, with no score
  * calibration between systems: only ranks enter the fused score.
  *
  * Scale shape: each side is first cut to its top-`poolSize` candidates
  * via sort+limit — TakeOrderedAndProject, per-partition heaps merged
  * driver-side, NEVER a global window over the corpus-sized scored
  * side. The rank window then runs over ≤ `poolSize` rows per side, and
  * the fusion aggregate over ≤ sides × `poolSize` rows. A 100 TB corpus
  * contributes exactly its top pools.
  *
  * Determinism: per-side ranks order by (rounded score desc, id) — the
  * rounding (`scoreScale` decimals) absorbs cross-engine float noise in
  * the last bits of a score so rank boundaries can't flip, and the id
  * breaks exact ties. Each rank contributes `1e9 div (k0 + rank)`
  * NANO-UNITS as a long — integer division, summed exactly — so the
  * fused score is bit-identical however many sides fuse and in whatever
  * order their rows arrive (a double `1/(k0+r)` sum would be
  * association-order-sensitive at 3+ sides).
  */
object Fusion {

  /** Fuse `sides` (each: one row per candidate with `idCol` and
    * `scoreCol`, higher = better) into the top-`k` by RRF.
    *
    * Output: (id, rrf_nano, n_sides, best_rank) — `rrf_nano` the exact
    * integer fused score, `n_sides` how many systems surfaced the
    * candidate, `best_rank` its best per-system rank.
    */
  def rrfFuse(sides: Seq[DataFrame], idCol: String, scoreCol: String,
      k: Int, poolSize: Int = 100, k0: Int = 60,
      scoreScale: Int = 6): DataFrame = {
    require(sides.size >= 2, "fusion needs at least two sides")
    require(k > 0, "k must be positive")
    require(poolSize > 0, "poolSize must be positive")
    require(k0 >= 1, "k0 must be >= 1")
    val ranked = sides.map { df =>
      val pooled = df
        .select(col(idCol),
          round(col(scoreCol).cast("double"), scoreScale).as("__s"))
        // an unscored candidate is NOT ranked: desc sorts nulls last,
        // but inside an underfilled pool they would still receive
        // ranks and real RRF contributions, letting a score-less row
        // out-rank a genuinely scored one from the other side
        .filter(col("__s").isNotNull)
        .orderBy(col("__s").desc, col(idCol))
        .limit(poolSize)
      // window over the pooled ≤ poolSize rows only
      pooled
        .withColumn("__rank",
          row_number().over(Window.orderBy(col("__s").desc, col(idCol))))
        .select(col(idCol), col("__rank"))
    }.reduce(_ unionByName _)
    ranked
      .withColumn("__contrib", expr(s"CAST(1000000000 div ($k0 + __rank) AS BIGINT)"))
      .groupBy(col(idCol))
      .agg(sum(col("__contrib")).as("rrf_nano"),
        count(lit(1)).as("n_sides"),
        min(col("__rank")).cast("long").as("best_rank"))
      .orderBy(col("rrf_nano").desc, col(idCol))
      .limit(k)
  }
}
