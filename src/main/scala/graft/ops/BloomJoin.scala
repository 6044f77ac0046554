package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning: drop fact rows whose join key cannot be
  * on the dim side BEFORE the join's shuffle.
  *
  * The regime where this wins at 100 TB: the dim side is too large to
  * broadcast as a hash relation (so Spark plans a sort-merge join and
  * shuffles the FULL fact table), but its key set still fits a few MB
  * of bloom bits. Pre-filtering with those bits turns "shuffle 100 TB,
  * join, discard 95%" into "shuffle the 5% that can match". Spark's
  * own runtime row-level filtering does this automatically only under
  * AQE with shuffle-reuse opportunities; this operator is the explicit,
  * always-available form.
  *
  * Mechanics: one aggregation job over the dim keys builds an
  * `org.apache.spark.util.sketch.BloomFilter` (driver holds only the
  * sketch — kilobytes to MB, never the keys); the fact side is filtered
  * with Spark's codegen'd `BloomFilterMightContain` over the serialized
  * bits as a foldable literal, so the probe stays inside whole-stage
  * codegen with zero per-row allocation.
  *
  * False positives pass the pre-filter and are discarded by the real
  * join that follows — results are exactly the plain join's. Scope:
  * inner/semi joins on integral keys (null keys never match an inner
  * join; `might_contain(null)` is null → filtered, consistently).
  */
object BloomJoin {

  /** Build a bloom filter of `dim[dimKey]` and return `fact` reduced to
    * rows whose `factKey` might be present. `fpp` trades bits for
    * shuffle reduction: 1% fpp ≈ 9.6 bits/key.
    */
  def pruneLarge(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, "expectedItems must be positive")
    // Both keys MUST be integral: the builder would insert a string
    // key via putString while the probe hashes the cast long —
    // disjoint hash inputs, so matching fact rows would survive only
    // at the false-positive rate and the join silently loses ~all of
    // its result. Reject eagerly instead.
    def requireIntegral(df: DataFrame, c: String, what: String): Unit =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
        case other => throw new IllegalArgumentException(
          s"$what must be an integral key (the bloom bits hash longs), got $other")
      }
    requireIntegral(dim, dimKey, "dimKey")
    requireIntegral(fact, factKey, "factKey")
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    import org.apache.spark.sql.GraftColumnBridge
    val might: Column = GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      GraftColumnBridge.expression(col(factKey).cast("long"))))
    fact.filter(might)
  }
}
