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
    // A vector containing a null ELEMENT would crash the typed
    // Seq[Double] encoder deep in the task ("Null value appeared in
    // non-nullable field" — no group, no column, no cause). Treat it
    // like a null vector (skipped): a partially-null embedding is a
    // failed embedding, the [[Similarity]] zero-norm stance.
    val casted = col(vecCol).cast("array<double>")
    df.select(col(groupCol).cast("string"),
        when(exists(casted, _.isNull), lit(null)).otherwise(casted).as(vecCol))
      .as[In]
      .groupByKey(_._1)
      .agg(MeanVec.toColumn.name("centroid"))
      .toDF(groupCol, "centroid")
  }

  /** Deterministic ±1 sign for projection cell (k, d): parity of the
    * LAST hex digit of md5("<tag>:k:d") — a hex-string operation with
    * no endianness or width ambiguity, so any engine reproduces it
    * (`('0x' || substr(md5(s), 32, 1))::INT % 2` in DuckDB).
    */
  private[ops] def projSign(tag: String, k: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag:$k:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (hex.charAt(31).asDigit % 2 == 0) 1.0 else -1.0
  }

  /** Random SIGNED projection (Achlioptas 2003 / the
    * Johnson–Lindenstrauss database-friendly form): reduce `vecCol`
    * from `inDims` to `outDims` with out[k] = Σ_d ±v[d] / √outDims,
    * signs drawn from the engine-portable md5 parity above. The
    * standard pre-LSH/pre-IVF step at 100 TB: banding 4096-dim
    * embeddings directly is 64× the shuffle weight of banding their
    * 64-dim projections, and pairwise distances survive within the JL
    * bound.
    *
    * The projection matrix is baked into the PLAN as sign-row ARRAY
    * literals, one per output dim, each consumed by the native
    * [[graft.functions.DotProduct vec_dot]] loop — row-local,
    * shuffle-free, no matrix table, no join. Sign rows as array
    * literals (not an unrolled `element_at(v,d)*s` sum per cell) keep
    * the GENERATED CODE O(outDims) regardless of width: the unrolled
    * form at 64×8 cells already blew janino's 64 KB method limit and
    * silently knocked the whole stage back to interpreted evaluation.
    * The float math is unchanged — the loop accumulates in the same
    * ascending-index order as the old left-fold expression tree.
    *
    * Output: (idCol, out_dim ∈ [0, outDims), value) rows. Vectors not
    * exactly `inDims` wide yield null values (ANSI-safe guard), never
    * a silent misprojection.
    */
  def signedProject(df: DataFrame, idCol: String, vecCol: String,
      inDims: Int, outDims: Int, tag: String = "rp"): DataFrame = {
    require(inDims > 0 && outDims > 0, "dims must be positive")
    require(outDims <= inDims, "projection must reduce dimensionality")
    val norm = math.sqrt(outDims.toDouble)
    val vec = col(vecCol).cast("array<double>")
    val exprs = (0 until outDims).map { k =>
      val signRow = typedLit(Array.tabulate(inDims)(d => projSign(tag, k, d)))
      when(size(vec) === inDims,
        graft.functions.GraftExtensions.vec_dot(vec, signRow) / lit(norm))
    }
    df.select(col(idCol),
      posexplode(array(exprs: _*)).as(Seq("out_dim", "value")))
  }
}
