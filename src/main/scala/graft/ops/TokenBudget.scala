package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group TOKEN-BUDGET sampling — corpus mixing by token counts, not
  * document fractions (the FineWeb/Dolma recipe: "take 30 B tokens of
  * web, 5 B of code"): within each group, documents are laid out in a
  * deterministic md5-shuffled order and kept while the group's running
  * token total is still under its budget. Deterministic in the key —
  * the same documents win on every run, engine, and partitioning; a
  * document is kept iff the tokens BEFORE it are < budget, so the
  * budget is met, overshot by at most one document.
  *
  * The naive formulation is a per-group global sort (cumulative sum
  * window) — one task per group, the usual 100 TB straggler. This op
  * keeps the exact semantics with bounded tasks, the same
  * histogram-locate trick as [[Percentiles]]:
  *
  *  1. each row's md5 prefix (2 hex chars) names one of 256 SLICES —
  *     slice order is a prefix of the row order, so slices are
  *     contiguous runs of the ordered group;
  *  2. a tiny aggregate: per-(group, slice) token sums → driver
  *     (≤ groups × 256 cells — groups are the budget map's keys,
  *     bounded by construction);
  *  3. a cumulative walk locates each group's CROSSING slice: slices
  *     wholly under budget are kept with NO window at all; slices past
  *     it are dropped; only the one crossing slice per group (~1/256
  *     of the group) runs the cumulative-sum window.
  */
object TokenBudget {

  /** Keep ≈`budgets(group)` tokens per group (exact rule above).
    * Groups absent from `budgets` are dropped — the map IS the mix
    * recipe. Rows with null group/weight/key are dropped (no rank).
    * `weightCol` must be integral (exact accumulation is the
    * determinism contract — float running sums are order-sensitive).
    *
    * The internal cache (the filtered+hashed input is read by the
    * histogram, full-slice and crossing-slice passes) is released when
    * the context cleaner garbage-collects the plan; long-lived
    * sessions mixing large corpora repeatedly should use
    * [[sampleManaged]] and call the cleanup handle after materializing
    * the result.
    */
  def sample(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      weightCol: String,
      budgets: Map[String, Long]): DataFrame =
    sampleManaged(df, keyCol, groupCol, weightCol, budgets)._1

  /** As [[sample]], plus a cleanup thunk that unpersists the internal
    * cache — call it once the result has been materialized.
    * (Correctness never depends on the cache: the slice histogram is
    * collected eagerly in this call, and both kept branches are
    * deterministic — only the avoided recomputation is at stake.)
    */
  def sampleManaged(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      weightCol: String,
      budgets: Map[String, Long]): (DataFrame, () => Unit) = {
    require(budgets.nonEmpty, "need at least one group budget")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    df.schema(weightCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"weight column '$weightCol' must be integral for exact budgets, got $other")
    }
    val reserved = Seq("__tb_h", "__tb_slice", "__tb_cum", "__tb_before", "__tb_w")
    require(!df.columns.exists(reserved.contains),
      s"input reserves column name(s) ${reserved.mkString(", ")}")
    val spark = df.sparkSession

    // Pinned: the slice histogram, the full-slice branch and the
    // crossing-slice branch all read the same filtered+hashed rows —
    // without the cache the source is scanned three times (the
    // histogram collect below populates it). The weight is widened to
    // long ONCE here: sums and running sums then accumulate in long
    // regardless of the declared integral width (min()/sum() preserve
    // narrow input types otherwise).
    val inScope = df
      .filter(col(groupCol).isNotNull && col(weightCol).isNotNull && col(keyCol).isNotNull)
      .filter(col(groupCol).isin(budgets.keys.toSeq: _*))
      .withColumn("__tb_h", md5(col(keyCol).cast("string")))
      .withColumn("__tb_slice",
        conv(substring(col("__tb_h"), 1, 2), 16, 10).cast("int"))
      .withColumn("__tb_w", col(weightCol).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 2. driver-sized slice histogram: budgets.size × 256 cells max.
    // The same pass carries the min weight — the slice walk below
    // assumes monotone running sums, so a negative weight must fail
    // loudly HERE (it would silently misclassify its slice as full or
    // dropped), and the guard costs no extra scan.
    // Collect + validation failures must unpersist (no cleanup handle
    // has been returned yet, so nothing else ever could — the
    // Binning.labeledPartition guard).
    val sliceRows =
      try {
        val rows = inScope
          .groupBy(col(groupCol), col("__tb_slice"))
          .agg(sum(col("__tb_w")).as("__tb_sum"), min(col("__tb_w")).as("__tb_min"))
          .collect()
        rows.find(_.getLong(3) < 0).foreach { r =>
          throw new IllegalArgumentException(
            s"negative weight (min ${r.getLong(3)}) in group '${r.getString(0)}' — " +
              "token budgets need non-negative weights (running sums must be monotone)")
        }
        rows
      } catch { case e: Throwable => inScope.unpersist(); throw e }
    val sliceSums: Map[(String, Int), Long] = sliceRows
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap

    // 3. walk each group's slices in order: full / crossing / dropped.
    val fullSlices = Seq.newBuilder[(String, Int)]
    val crossing = Seq.newBuilder[(String, Int, Long)] // (group, slice, cumBefore)
    budgets.foreach { case (g, budget) =>
      var cum = 0L
      (0 until 256).foreach { s =>
        sliceSums.get((g, s)).foreach { w =>
          if (cum + w < budget) fullSlices += ((g, s))
          else if (cum < budget) crossing += ((g, s, cum))
          // else: cum >= budget — dropped
          cum += w
        }
      }
    }

    import spark.implicits._
    val fullDf = broadcast(fullSlices.result().toDF(groupCol + "__tb_g", "__tb_slice_f"))
    val keptFull = inScope.join(fullDf,
      col(groupCol) === col(groupCol + "__tb_g") && col("__tb_slice") === col("__tb_slice_f"),
      "left_semi")

    // 4. the one crossing slice per group runs the cumulative window —
    // a task sees ~1/256 of ONE group, not the group.
    val crossDf = broadcast(crossing.result()
      .toDF(groupCol + "__tb_g", "__tb_slice_c", "__tb_before"))
    val budgetCol: Column = budgets.foldLeft(lit(-1L)) { case (acc, (g, b)) =>
      when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__tb_h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val keptCross = inScope.join(crossDf,
        col(groupCol) === col(groupCol + "__tb_g") && col("__tb_slice") === col("__tb_slice_c"))
      .withColumn("__tb_cum",
        col("__tb_before") + coalesce(sum(col("__tb_w")).over(w), lit(0L)))
      .filter(col("__tb_cum") < budgetCol)
      .select(inScope.columns.map(col): _*)

    val out = keptFull.unionByName(keptCross)
      .select(df.columns.map(col): _*)
    (out, () => { inScope.unpersist(); () })
  }
}
