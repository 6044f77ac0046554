package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Element-wise vector aggregation over embedding columns.
  *
  * Centroids (mean pooling per group) are the building block for IVF
  * training, per-class prototypes, and embedding-drift monitoring. The
  * naive formulation — posexplode to (row × dim) then groupBy(group,
  * dim) — multiplies the shuffle by the vector width (64× here, 4096×
  * for real embedding tables). This typed `Aggregator` instead keeps
  * ONE running (sum[dim], count) buffer per group per map task, so the
  * shuffle carries `groups × tasks` buffers regardless of row count:
  * map-side combine for vectors.
  *
  * Mixed-width vectors fail loudly (a silent zip would average
  * misaligned dimensions); null/empty vectors are skipped, and a group
  * with only null vectors yields an empty centroid.
  */
object VectorAgg {

  private type In = (String, Seq[Double])
  private type Buf = (Array[Double], Long)

  private object MeanVec extends Aggregator[In, Buf, Seq[Double]] {
    def zero: Buf = (Array.emptyDoubleArray, 0L)
    def reduce(b: Buf, a: In): Buf = {
      val v = a._2
      if (v == null || v.isEmpty) b
      else if (b._2 == 0L) (v.toArray, 1L)
      else {
        require(b._1.length == v.length,
          s"mixed vector widths in one group: ${b._1.length} vs ${v.length}")
        var i = 0
        while (i < v.length) { b._1(i) += v(i); i += 1 }
        (b._1, b._2 + 1)
      }
    }
    def merge(x: Buf, y: Buf): Buf =
      if (x._2 == 0L) y
      else if (y._2 == 0L) x
      else {
        require(x._1.length == y._1.length,
          s"mixed vector widths in one group: ${x._1.length} vs ${y._1.length}")
        var i = 0
        while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
        (x._1, x._2 + y._2)
      }
    def finish(b: Buf): Seq[Double] =
      if (b._2 == 0L) Seq.empty else b._1.toIndexedSeq.map(_ / b._2)
    def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** @return (`groupCol` as string, `centroid` array<double>) — one row
    * per group, single pass, map-side combined.
    */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(vecCol).cast("array<double>"))
      .as[In]
      .groupByKey(_._1)
      .agg(MeanVec.toColumn.name("centroid"))
      .toDF(groupCol, "centroid")
  }
}
