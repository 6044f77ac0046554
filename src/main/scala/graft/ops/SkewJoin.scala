package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting.
  *
  * When one join key dominates (power-law fact tables), the shuffle
  * partition holding it becomes the straggler. Salting splits each hot
  * left-side key across `saltBuckets` partitions and replicates the
  * right side once per bucket: the shuffle spreads evenly, the join
  * result is IDENTICAL to the plain join.
  *
  * AQE's skewedJoin handles moderate skew at runtime; explicit salting
  * is the deterministic tool for known-pathological keys (and works in
  * non-AQE contexts like streaming joins). Right-side replication costs
  * |right| × saltBuckets — use for dimension-sized right sides.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    // Right/full outer would emit every unmatched right row once per
    // salt replica — the salt stops being invisible. Flip the sides for
    // a right-skewed outer join instead.
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")) ||
        allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi join types, got '$joinType'")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Top-N most frequent keys of a column — the reconnaissance step for
    * deciding whether salting is warranted (one cheap aggregation).
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
