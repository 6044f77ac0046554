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
    private def prune(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      if (b.size <= k) b else b.sorted(ord).take(k)
    def zero: Seq[(Double, Long)] = Vector.empty
    def reduce(b: Seq[(Double, Long)], a: Row3): Seq[(Double, Long)] =
      prune(b :+ ((a._2, a._3)))
    def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      prune(x ++ y)
    def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b.sorted(ord).take(k)
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
    val ds = df.select(col(groupCol).cast("string"), col(orderCol).cast("double"),
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
