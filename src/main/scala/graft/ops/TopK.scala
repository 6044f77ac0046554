package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k via a bounded typed `Aggregator` — the scale shape
  * for "k best rows per key".
  *
  * The window formulation (`row_number` ≤ k) sorts EVERY group's full
  * contents and ships every row through the shuffle. The aggregator
  * keeps at most k rows per group in each map task's partial buffer,
  * so only `tasks × k` candidate rows per group ride the shuffle and
  * nothing is globally sorted — the 100 TB difference between "top 5
  * of a billion rows per key" being trivial or a spill storm.
  *
  * Ordering: `orderCol` descending, `tieCol` ascending — supply a
  * unique tie column (or a computed one) for deterministic results.
  */
object TopK {

  private type Row3 = (String, Double, Long)

  private class TopKAgg(k: Int) extends Aggregator[Row3, Seq[(Double, Long)], Seq[(Double, Long)]] {
    // Descending by value with SPARK's NaN semantics (NaN greater than
    // every real double — java.lang.Double.compare's total order, the
    // same one Spark's desc sort uses), ties ascending. A scala
    // Ordering.by(-v) key would send NaN LAST (−NaN is still NaN) and
    // silently prune NaN rows the window formulation would rank first.
    private val ord = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    // INVARIANT: the buffer is kept sorted by `ord` at all times. The
    // hot path is then O(1) per losing row (most rows of a billion-row
    // group lose to the current top-k) and a binary-search insert for
    // winners — a full re-sort of the buffer per input row would pay
    // O(k log k) comparisons on exactly the path this class exists to
    // make cheap.
    private def insertSorted(b: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] = {
      var lo = 0; var hi = b.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.compare(b(mid), e) <= 0) lo = mid + 1 else hi = mid
      }
      val (pre, post) = b.splitAt(lo)
      val ins = (pre :+ e) ++ post
      if (ins.size > k) ins.take(k) else ins
    }
    def zero: Seq[(Double, Long)] = Vector.empty
    def reduce(b: Seq[(Double, Long)], a: Row3): Seq[(Double, Long)] = {
      val e = (a._2, a._3)
      if (b.size >= k && ord.compare(e, b(b.size - 1)) >= 0) b // loses to the worst kept
      else insertSorted(b, e)
    }
    def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      // classic sorted-merge of two sorted buffers, capped at k
      if (x.isEmpty) y.take(k)
      else if (y.isEmpty) x.take(k)
      else {
        val out = Vector.newBuilder[(Double, Long)]
        var i = 0; var j = 0; var n = 0
        val cap = math.min(k, x.size + y.size)
        while (n < cap) {
          if (j >= y.size || (i < x.size && ord.compare(x(i), y(j)) <= 0)) {
            out += x(i); i += 1
          } else { out += y(j); j += 1 }
          n += 1
        }
        out.result()
      }
    }
    def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b.take(k)
    def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  /** @return (groupCol string, rank 1..k, orderCol value, tieCol value)
    *
    * Rows whose order or tie value is null (or casts to null) are
    * EXCLUDED — they would crash the primitive-typed buffer encoder,
    * and "null is never in the top k" is the useful semantics anyway.
    * This differs from the `row_number` window form (desc ranks nulls
    * last) only for groups with fewer than k non-null rows.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // The buffer holds the order value as a DOUBLE; a long/decimal
    // above 2^53 is not exactly representable, so two distinct order
    // values could collapse and the tie column would pick the WRONG
    // top row with no warning. Guard with a null-safe round-trip check
    // (codegen'd comparison, only materialized for the lossy-capable
    // source types) — loud failure beats a silently different top-k.
    val orderType = df.schema(orderCol).dataType
    val orderD = col(orderCol).cast("double")
    val safeOrder = orderType match {
      case org.apache.spark.sql.types.LongType |
           _: org.apache.spark.sql.types.DecimalType =>
        when(col(orderCol).isNotNull && !(orderD.cast(orderType) <=> col(orderCol)),
          raise_error(concat(lit(s"orderCol '$orderCol' value "),
            col(orderCol).cast("string"),
            lit(" is not exactly representable as a double (|v| > 2^53) — " +
              "the aggregator's double buffer would rank it wrongly"))))
          .otherwise(orderD)
      case _ => orderD
    }
    val ds = df.select(col(groupCol).cast("string"), safeOrder.as(orderCol),
        col(tieCol).cast("long"))
      .filter(col(orderCol).isNotNull && col(tieCol).isNotNull)
      .as[Row3]
    ds.groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn.name("top"))
      .flatMap { case (g, top) =>
        top.iterator.zipWithIndex.map { case ((v, t), i) => (g, i + 1L, v, t) }
      }
      .toDF(groupCol, "rank", orderCol, tieCol)
  }
}
