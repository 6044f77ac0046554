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
  * Scale shape: NO data shuffle. Weights ride one broadcast (the
  * per-source table is driver-sized by contract), the epoch fan-out is
  * a row-local `explode(sequence(...))` bounded by ceil(w) and the
  * draw is a codegen'd filter, so mixing streams straight off the
  * scan — the output can feed a sink or downstream shuffle without an
  * exchange of its own. Row multiplication is exactly the requested
  * oversampling, never more.
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
    val reserved = Set("__w", "__cut", "epoch", "__mx_src", "__mx_w", "__mx_cut")
    require(!df.columns.exists(reserved),
      s"reserved column name collision (${reserved.mkString(", ")})")

    // Per-source plan, computed driver-side (weights ARE driver-side):
    // floor(w) full epochs plus a boundary epoch drawn at the
    // fractional remainder via the engine-portable md5 threshold
    // ([[Sampling.hexThreshold]]; remainder 0 → cut "00000000", below
    // every md5 digest, so whole-number weights drop the boundary).
    // The plan rides a BROADCAST of the weights table, not a
    // when()-chain: temperatureMix legitimately passes up to maxGroups
    // (10k) entries, and a 10k-deep nested CaseWhen overflows the
    // driver stack in Catalyst's tree visitors (and blows the 64KB
    // JVM method limit far earlier).
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = broadcast(weights.toSeq.sortBy(_._1).map { case (s, w) =>
      (s, math.floor(w).toLong, Sampling.hexThreshold(w - math.floor(w)))
    }.toDF("__mx_src", "__mx_w", "__mx_cut"))
    val dFloor = math.floor(defaultWeight).toLong
    val dCut = Sampling.hexThreshold(defaultWeight - math.floor(defaultWeight))
    // Null keys share ONE deterministic draw per epoch (md5 of the
    // empty key) instead of a null predicate silently dropping them
    // from fractional epochs only.
    val keyStr = coalesce(col(keyCol).cast("string"), lit(""))
    df.join(wdf, col(sourceCol) === col("__mx_src"), "left")
      .withColumn("__w", coalesce(col("__mx_w"), lit(dFloor)))
      .withColumn("__cut", coalesce(col("__mx_cut"), lit(dCut)))
      .drop("__mx_src", "__mx_w", "__mx_cut")
      .filter(col("__w") > 0 || col("__cut") > "00000000")
      .withColumn("epoch", explode(sequence(lit(0L), col("__w"))))
      .filter(col("epoch") < col("__w") ||
        md5(concat(keyStr, lit(":"), col("epoch").cast("string")))
          < col("__cut"))
      .drop("__w", "__cut")
  }

  /** Temperature-rescaled corpus balancing — the UniMax/multilingual
    * move: upsample small groups toward the largest one, capped at
    * `maxEpochs` repeats so a tiny group is never replicated without
    * bound (UniMax's epoch cap). Each group's weight is
    *
    *   w_g = min((n_max / n_g)^alpha, maxEpochs)
    *
    * — `alpha = 0` leaves the natural distribution, `alpha = 1` fully
    * equalizes group volumes (up to the cap), `alpha = 0.5` is the
    * square-root temperature most multilingual recipes use. The
    * resulting composition is p_g ∝ n_g^(1-alpha) — exactly
    * temperature sampling with τ = 1/(1-alpha), materialized
    * deterministically by [[mixCorpora]]'s epoch fan-out + md5 draw.
    *
    * Group sizes come from one tiny aggregate (groups are a bounded
    * vocabulary — languages, sources; guarded by `maxGroups`); the mix
    * itself stays a shuffle-free row-local filter.
    *
    * EXACTNESS: n_max/n_g is an exact-int double division and
    * `alpha = 0.5` uses `sqrt` (correctly rounded IEEE), so for the
    * common alphas {0, 0.5, 1} the weights — and therefore every md5
    * cut — are bit-identical on any engine: the whole op is
    * oracle-checkable. Other alphas go through `pow`, whose last ulp
    * is libm-specific; fine for production, not for cross-engine
    * hash equality.
    *
    * NULL GROUPS: rows whose `groupCol` is null are DROPPED — weights
    * are fit on non-null groups only and [[mixCorpora]]'s default
    * weight for unlisted groups is 0.0. Coalesce nulls to a sentinel
    * group first ("unknown") to keep them, mirroring
    * [[TokenBudget.sample]]'s explicit null handling.
    */
  def temperatureMix(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      alpha: Double = 0.5,
      maxEpochs: Double = 4.0,
      maxGroups: Int = 10000): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    require(maxEpochs >= 1.0, "maxEpochs must be >= 1")
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(counts.length <= maxGroups,
      s"${counts.length} groups exceed maxGroups=$maxGroups — temperature mixing " +
        "expects a bounded group vocabulary (languages, sources)")
    if (counts.isEmpty) return mixCorpora(df, keyCol, groupCol, Map("" -> 0.0))
    val nMax = counts.map(_._2).max
    def ratioPow(r: Double): Double = alpha match {
      case 0.0 => 1.0
      case 1.0 => r
      case 0.5 => math.sqrt(r) // correctly rounded — engine-portable
      case a   => math.pow(r, a)
    }
    val weights = counts.map { case (g, n) =>
      g -> math.min(ratioPow(nMax.toDouble / n.toDouble), maxEpochs)
    }.toMap
    mixCorpora(df, keyCol, groupCol, weights, defaultWeight = 0.0)
  }
}
