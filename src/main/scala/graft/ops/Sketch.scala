package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count artifacts (Apache DataSketches HLL, the
  * engine built-ins behind `hll_sketch_agg`/`hll_union_agg`).
  *
  * The 100 TB use case is corpus ACCOUNTING: "how many distinct
  * tokens / urls / domains does each source contribute, and the union
  * of all of them?" Exact `count(DISTINCT)` answers one grouping per
  * full scan; a persisted per-shard sketch artifact answers every
  * later rollup — per-source, per-language, global union, yesterday ∪
  * today — by merging kilobyte-sized sketch blobs, never rescanning
  * text. Same artifact stance as [[Dedup.minhashArtifact]].
  *
  * Determinism boundary — stated, not papered over: a sketch's
  * ESTIMATE can vary at the ±rsd level with insertion/merge order
  * (DataSketches' HIP accumulator is order-sensitive, and Spark
  * aggregation order varies with partitioning), so estimates never
  * feed a hash-matched gate directly — gates ship exact values plus
  * error-bound VERDICTS (the `q_approx_sketches` convention), and
  * callers treat [[estimate]] as a profiling number, not an identity.
  *
  * lgK = 12 (4096 buckets, ~2 KB dense) puts the relative standard
  * deviation at ~1.6%; [[hllWithinBound]]'s default bound of 6% is
  * ≈ 3.7× rsd — a regression past it is a bug, not noise.
  */
object Sketch {

  /** Default log2 of the HLL bucket count: rsd ≈ 1.04/√2¹² ≈ 1.6%. */
  val DefaultLgK = 12

  /** Per-group distinct-count sketch over `valueCol`: one binary
    * `hll` column per group (empty `groupCols` → one global row).
    * Nulls never count (the SQL `count(DISTINCT)` convention). The
    * aggregation is map-side combinable — each task sketches locally
    * and ships ~2 KB, so the shuffle carries groups × KB regardless
    * of row count. Persist the result as the accounting artifact.
    */
  def hllFit(df: DataFrame, valueCol: String, groupCols: Seq[String],
      lgK: Int = DefaultLgK): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"hllFit: lgK must be in [4, 21], got $lgK")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))
  }

  /** Merge sketch artifacts back to coarser groups (or to one global
    * row with empty `groupCols`): distinct-union semantics, exact
    * de-overlap — an element present in many shards counts once.
    * Inputs must share one lgK (the [[hllFit]] discipline);
    * `allowDifferentLgConfigK = false` makes a mixed-artifact mistake
    * fail loudly instead of silently degrading precision.
    */
  def hllMerge(sketches: DataFrame, groupCols: Seq[String],
      hllCol: String = "hll"): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col(hllCol), lit(false)).as("hll"))

  /** Estimated distinct count of a sketch column (double-rounded long,
    * the engine's own estimator).
    */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Error-bound verdict: |estimate − exact| ≤ bound · exact, with an
    * absolute slack of 1 so tiny groups (where HLL is exact but the
    * relative form degenerates at exact = 0) never flap.
    */
  def hllWithinBound(sketch: Column, exact: Column,
      bound: Double = 0.06): Column =
    abs(estimate(sketch) - exact) <= greatest(exact * bound, lit(1.0))
}
