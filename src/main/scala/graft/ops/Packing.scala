package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end-to-end and cut fixed
  * token-budget training sequences (the concat-then-chunk layout GPT
  * pretraining uses), rather than first-fit bin packing, which is
  * inherently sequential and neither parallelizes nor reproduces.
  *
  * Documents are sharded by id, ordered deterministically inside each
  * shard, and assigned `pack = floor(exclusive-prefix-tokens /
  * budget)`; a document whose tokens straddle a cut belongs to the
  * pack its first token lands in. Everything is integer window math
  * over bounded shards:
  *
  *  - determinism: same inputs → same packs on any engine, run, or
  *    partitioning (no rand(), no partition-order dependence);
  *  - scale: one hash shuffle on the shard id; per-task work is one
  *    streaming prefix-sum over its shard. `shards` caps window size —
  *    pick it so a shard's documents fit one task (e.g. 100k shards
  *    over 10 B docs → 100k-doc tasks); packs never span shards.
  */
object Packing {

  /** @param budget tokens per pack (> 0)
    * @param shards independent packing streams (> 0)
    * @return input columns + `shard` and `pack` (ids unique per
    *         (shard, pack))
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      shards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    require(!docs.columns.contains("shard") && !docs.columns.contains("pack"),
      "reserved column name collision (shard/pack)")
    // pmod on a non-numeric id would fail mid-job under ANSI (or
    // worse, null every shard with ANSI off — one unbounded window)
    require(docs.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"idCol must be numeric for sharding, got ${docs.schema(idCol).dataType}; " +
        "hash string ids to a numeric column first")
    // Token counts must be integral (a double prefix sum loses
    // exactness) and non-negative (a negative count makes the running
    // sum non-monotone, silently assigning a later document to an
    // EARLIER pack so one pack overflows the budget) — the TokenBudget
    // monotonicity contract, enforced per row in codegen.
    require(docs.schema(tokenCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }, s"tokenCol must be an integral type, got ${docs.schema(tokenCol).dataType}")
    val tok = when(col(tokenCol) < 0, raise_error(concat(
        lit("packSequences: negative token count "), col(tokenCol).cast("string"),
        lit(" — running pack sums must be monotone"))))
      .otherwise(col(tokenCol))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("shard", pmod(col(idCol), lit(shards)).cast("long"))
      .withColumn("pack",
        floor(coalesce(sum(tok).over(w), lit(0L)) / budget))
  }
}
