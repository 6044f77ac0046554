package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride through the engine as
  * opaque `binary` columns plus typed metadata, exactly like a 100 TB
  * image/audio corpus would (payload in parquet/object store, metadata
  * columns for pruning).
  *
  * The actual codec work (image decode, resample, frame extraction) is
  * STUBBED — the container ships no media libraries — behind
  * deterministic byte-derived fakes. The Spark-side plumbing is real:
  * binary schema, per-partition batched iteration (the Scala analogue of
  * `mapInPandas` batches), and a typed output schema.
  */
object Multimodal {

  final case class MediaFeature(
      id: Long, n_bytes: Int, format: String,
      width: Int, height: Int, feature_crc: Long)

  /** "Decode" each payload and emit typed features. Batch shape: one
    * partition is processed as a single iterator pass (constant memory),
    * the way a real decoder batch UDF would run.
    *
    * STUB: width/height/format/crc are derived from the payload bytes
    * deterministically instead of a real codec.
    */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          // Deterministic fake decode: dimensions/crc from byte content.
          var crc = 1125899906842597L
          var i = 0
          while (i < n) { crc = 31 * crc + (bytes(i) & 0xff); i += 1 }
          val fmt = if (n == 0) "empty" else if ((bytes(0) & 1) == 0) "img" else "audio"
          MediaFeature(id, n, fmt,
            width = 16 + (math.abs(crc) % 64).toInt,
            height = 16 + (math.abs(crc / 64) % 64).toInt,
            feature_crc = crc)
        }
      }
  }

  /** Relational metadata over an opaque binary column — fully
    * oracle-checkable (byte length + digest).
    */
  def binaryMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol),
      length(col(payloadCol).cast("binary")).as("n_bytes"),
      md5(col(payloadCol).cast("binary")).as("digest"))
}
