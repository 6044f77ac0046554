package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted dataset mixing — the corpus-composition step of a training
  * pipeline (downsample dominant web crawl, upsample small
  * high-quality sources by repeating them across epochs).
  *
  * Each source gets a target weight `w`:
  *  - `w <= 1`: keep a deterministic hash-sampled fraction `w`
  *    (epoch 0 only);
  *  - `w > 1`: emit `floor(w)` full epoch-tagged copies plus a
  *    hash-sampled fractional copy for the remainder, so e.g. `w=2.5`
  *    yields epochs 0 and 1 in full and half of epoch 2.
  *
  * The fractional draw hashes (key, epoch) — the SAME deterministic
  * md5 predicate as [[Sampling]], so the chosen rows are stable across
  * runs, engines, and cluster layouts, and a re-mix with a higher
  * weight is a superset of the lower-weight mix (monotone in `w` per
  * epoch). Sources absent from `weights` fall back to
  * `defaultWeight` (0 = drop).
  *
  * Scale shape: NO shuffle at all. The epoch fan-out is a row-local
  * `explode(sequence(...))` bounded by ceil(w) and the draw is a
  * codegen'd filter, so mixing streams straight off the scan — the
  * output can feed a sink or downstream shuffle without an exchange of
  * its own. Row multiplication is exactly the requested oversampling,
  * never more.
  */
object Mixture {

  /** `df` restricted+repeated per `weights`, with an `epoch` column
    * (0-based repeat index) appended.
    */
  def mixCorpora(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 0.0): DataFrame = {
    require(weights.nonEmpty, "need at least one source weight")
    (weights.values ++ Seq(defaultWeight)).foreach(w =>
      require(w >= 0.0, s"weights must be >= 0, got $w"))
    require(!df.columns.exists(Set("__w", "__cut", "epoch")),
      "reserved column name collision (__w / __cut / epoch)")

    // Per-source plan, computed driver-side (weights ARE driver-side):
    // floor(w) full epochs plus a boundary epoch drawn at the
    // fractional remainder via the engine-portable md5 threshold
    // ([[Sampling.hexThreshold]]; remainder 0 → cut "00000000", below
    // every md5 digest, so whole-number weights drop the boundary).
    def bySource(f: Double => Any): org.apache.spark.sql.Column =
      weights.toSeq.sortBy(_._1).foldLeft(lit(f(defaultWeight))) {
        case (acc, (src, w)) => when(col(sourceCol) === src, lit(f(w))).otherwise(acc)
      }
    val floorW = bySource(w => math.floor(w).toLong)
    val fracCut = bySource(w => Sampling.hexThreshold(w - math.floor(w)))
    df.withColumn("__w", floorW)
      .withColumn("__cut", fracCut)
      .filter(col("__w") > 0 || col("__cut") > "00000000")
      .withColumn("epoch", explode(sequence(lit(0L), col("__w"))))
      .filter(col("epoch") < col("__w") ||
        md5(concat(col(keyCol).cast("string"), lit(":"), col("epoch").cast("string")))
          < col("__cut"))
      .drop("__w", "__cut")
  }
}
