package graft.extract.v2

import graft.ops.Warc
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 WARC/WET reader — crawl shards as a DataFrame:
  *
  * {{{
  * spark.read.format("graft.extract.v2.WarcDataSourceV2")
  *   .option("path", "/crawl/segment")   // file or directory
  *   .option("strict", "false")          // default: skip malformed tails
  *   .load()
  * }}}
  *
  * Each FILE is one input partition: gzip members are not splittable,
  * and crawls are shipped as many ~1 GB shards precisely so that
  * file-per-task IS the parallelism (a 100 TB crawl is ~100k shards —
  * ample tasks for any cluster). Records stream through
  * [[graft.ops.Warc.WarcReader]] one at a time — constant memory per
  * task regardless of shard size.
  *
  * The schema is FIXED (the WARC grammar defines it, nothing to
  * infer — no planning-time file reads at all). Column pruning is
  * real: when `payload` is not required, record bodies are skipped
  * byte-wise instead of materialized, so a metadata-only query (URL
  * census, type counts) never allocates page bodies.
  *
  * `strict=false` (default) keeps every well-formed record of a shard
  * and drops a malformed tail — the crawl reality, where a truncated
  * shard should not kill a 100k-shard job; `strict=true` fails the
  * task with the record ordinal and file path.
  */
class WarcDataSourceV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSourceV2.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    WarcTable(new CaseInsensitiveStringMap(properties))
}

object WarcDataSourceV2 {
  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("rec_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  private[v2] val Extensions = Seq(".warc", ".warc.gz", ".wet", ".wet.gz")

  def listFiles(path: String, conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    require(path != null, "option 'path' is required")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val status = fs.getFileStatus(p)
    if (status.isDirectory)
      // isFile guard: a DIRECTORY named e.g. "segment.warc" must not be
      // opened as a shard (listing is one level, like the Excel source
      // — crawl layouts that nest segments pass the segment dir).
      fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.toString)
        .filter(f => Extensions.exists(f.endsWith)).sorted
    else Seq(status.getPath.toString)
  }

  private[v2] def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
}

final case class WarcTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"warc(${options.get("path")})"
  override def schema(): StructType = WarcDataSourceV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    WarcScanBuilder(options)
}

final case class WarcScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcDataSourceV2.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = WarcScan(required, options)
}

final case class WarcScan(required: StructType, options: CaseInsensitiveStringMap)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val files = WarcDataSourceV2.listFiles(options.get("path"),
      WarcDataSourceV2.hadoopConf())
    s"WarcScan(files=${files.size}, columns=${required.fieldNames.mkString(",")})"
  }
  override def planInputPartitions(): Array[InputPartition] =
    WarcDataSourceV2.listFiles(options.get("path"), WarcDataSourceV2.hadoopConf())
      .map(f => WarcFilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required.fieldNames,
      options.getBoolean("strict", false),
      new org.apache.spark.util.SerializableConfiguration(
        WarcDataSourceV2.hadoopConf()))
}

final case class WarcFilePartition(file: String) extends InputPartition

/** Executor side: one shard per partition, records streamed lazily. */
final case class WarcReaderFactory(requiredColumns: Array[String], strict: Boolean,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[WarcFilePartition].file
    val needPayload = requiredColumns.contains("payload")
    val p = new org.apache.hadoop.fs.Path(file)
    val stream = p.getFileSystem(conf.value).open(p)
    val reader =
      try new Warc.WarcReader(stream, strict, materializePayload = needPayload)
      catch { case t: Throwable => stream.close(); throw t }
    val fileUtf8 = UTF8String.fromString(file)

    // One extractor per required ordinal, resolved once — the row
    // build is a straight array fill per record.
    val extractors: Array[(Int, Warc.Rec) => Any] = requiredColumns.map {
      case "file" => (_: Int, _: Warc.Rec) => fileUtf8
      case "rec_idx" => (i: Int, _: Warc.Rec) => i
      case "warc_type" => (_: Int, r: Warc.Rec) =>
        r.warcType.map(UTF8String.fromString).orNull
      case "target_uri" => (_: Int, r: Warc.Rec) =>
        r.targetUri.map(UTF8String.fromString).orNull
      case "warc_date" => (_: Int, r: Warc.Rec) =>
        r.warcDate.map(UTF8String.fromString).orNull
      case "record_id" => (_: Int, r: Warc.Rec) =>
        r.recordId.map(UTF8String.fromString).orNull
      case "content_type" => (_: Int, r: Warc.Rec) =>
        r.contentType.map(UTF8String.fromString).orNull
      case "content_length" => (_: Int, r: Warc.Rec) => r.contentLength
      case "payload" => (_: Int, r: Warc.Rec) => r.payload
      case other => throw new IllegalArgumentException(
        s"unknown WARC column '$other'")
    }

    new PartitionReader[InternalRow] {
      private var idx = -1
      private var current: InternalRow = _
      override def next(): Boolean = {
        val rec =
          try reader.next()
          catch {
            case e: Warc.WarcFormatException =>
              throw new Warc.WarcFormatException(s"$file: ${e.getMessage}")
          }
        rec match {
          case Some(r) =>
            idx += 1
            // innermost scan loop: a plain array fill, no per-record
            // wrapper collections
            val arr = new Array[Any](extractors.length)
            var i = 0
            while (i < extractors.length) {
              arr(i) = extractors(i)(idx, r)
              i += 1
            }
            current =
              new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(arr)
            true
          case None =>
            // Lenient mode drops a malformed tail by design — but never
            // SILENTLY: the executor log names the shard and the error.
            reader.error.foreach { err =>
              org.slf4j.LoggerFactory.getLogger(classOf[WarcReaderFactory])
                .warn(s"$file: malformed tail dropped after " +
                  s"${reader.recordCount} records ($err)")
            }
            false
        }
      }
      override def get(): InternalRow = current
      // Close via the READER: that ends the gzip Inflater's native
      // buffers and cascades down to the FS stream; the extra
      // stream.close() is a harmless belt for the non-gzip path.
      override def close(): Unit =
        try reader.close() finally stream.close()
    }
  }
}
