package graft.extract.v2

import graft.extract.ExcelSource
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 Excel reader — the DISTRIBUTED complement of the
  * driver-side `graft.extract.ExcelSource` (SURVEY §7.3's "DataSource
  * V2 TableProvider if large"): `path` may be a directory of .xlsx
  * workbooks, and each FILE becomes one input partition, so thousands
  * of clinical workbooks decode in parallel on executors instead of
  * serially on the driver. Supports column pruning
  * (`SupportsPushDownRequiredColumns`) — unread columns are never
  * materialized from the grid.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.extract.v2.ExcelDataSourceV2")
  *   .option("path", "/data/workbooks")   // file or directory
  *   .option("sheet", "basic info")
  *   .option("has_headers", "true")
  *   .load()
  * }}}
  *
  * All columns surface as strings (the preprocessor cascade re-infers
  * types, same contract as the driver-side reader). The schema comes
  * from the first workbook; heterogeneous workbooks are a data error
  * surfaced per-file.
  */
class ExcelDataSourceV2 extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = ExcelDataSourceV2.hadoopConf()
    val files = ExcelDataSourceV2.listFiles(options.get("path"), conf)
    require(files.nonEmpty, s"no .xlsx files under ${options.get("path")}")
    val sheet = ExcelDataSourceV2.sheetOf(options)
    val hasHeaders = ExcelDataSourceV2.hasHeadersOf(options)
    val grid = ExcelDataSourceV2.sheetGrid(files.head, sheet, conf)
    val width = grid.map(_.length).maxOption.getOrElse(0)
    val names =
      if (hasHeaders && grid.nonEmpty)
        grid.head.padTo(width, null).zipWithIndex.map { case (h, i) =>
          Option(h).getOrElse(i.toString)
        }
      else (0 until width).map(_.toString)
    // Spark cannot bind duplicate attribute names in a V2 scan schema
    // (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND deep in planning) — and an
    // indexOf-based ordinal would silently serve the FIRST column's
    // data for every duplicate. Fail loudly at schema time instead.
    val dups = names.groupBy(identity).collect {
      case (n, occ) if occ.size > 1 => n
    }
    require(dups.isEmpty,
      s"${files.head}: duplicate header name(s) ${dups.mkString(", ")} in sheet " +
        s"'$sheet' — Spark cannot represent duplicate column names; " +
        "deduplicate the header row first")
    StructType(names.map(StructField(_, StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    ExcelTable(schema, new CaseInsensitiveStringMap(properties))
}

object ExcelDataSourceV2 {
  /** Driver-side Hadoop configuration for planning-time IO. */
  private[v2] def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  /** Paths resolve through the Hadoop FileSystem API, NOT java.io.File:
    * `hdfs://`/`s3a://` URIs and cluster-shared stores work the same as
    * local paths, and a driver-local directory invisible to executors
    * fails at open time with the real path in the message instead of
    * scattering FileNotFoundExceptions.
    */
  def listFiles(path: String, conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    require(path != null, "option 'path' is required")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val status = fs.getFileStatus(p) // throws FileNotFoundException with the path
    if (status.isDirectory)
      fs.listStatus(p).toSeq.map(_.getPath.toString).filter(_.endsWith(".xlsx")).sorted
    else Seq(status.getPath.toString)
  }
  def sheetOf(options: CaseInsensitiveStringMap): String = {
    val s = options.get("sheet")
    require(s != null, "option 'sheet' is required")
    s
  }
  def hasHeadersOf(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean("has_headers", true)

  def sheetGrid(file: String, sheet: String,
      conf: org.apache.hadoop.conf.Configuration): Vector[Vector[String]] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val in = p.getFileSystem(conf).open(p)
    val bytes =
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    ExcelSource.readWorkbookBytes(bytes, file).getOrElse(sheet,
      throw new IllegalArgumentException(s"$file: sheet '$sheet' not found"))
  }
}

final case class ExcelTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"excel(${options.get("path")}#${options.get("sheet")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    ExcelScanBuilder(tableSchema, options)
}

final case class ExcelScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = ExcelScan(fullSchema, required, options)
}

final case class ExcelScan(fullSchema: StructType, required: StructType,
    options: CaseInsensitiveStringMap) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ExcelScan(files=${ExcelDataSourceV2.listFiles(options.get("path"),
      ExcelDataSourceV2.hadoopConf()).size}, " +
      s"columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] =
    ExcelDataSourceV2.listFiles(options.get("path"), ExcelDataSourceV2.hadoopConf())
      .map(f => ExcelFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    ExcelReaderFactory(
      ExcelDataSourceV2.sheetOf(options),
      ExcelDataSourceV2.hasHeadersOf(options),
      fullSchema.fieldNames,
      required.fieldNames,
      new org.apache.spark.util.SerializableConfiguration(
        ExcelDataSourceV2.hadoopConf()))
}

final case class ExcelFilePartition(file: String) extends InputPartition

/** Executor-side reader: one workbook file per partition; only the
  * required column ordinals are materialized into rows.
  */
final case class ExcelReaderFactory(sheet: String, hasHeaders: Boolean,
    allColumns: Array[String], requiredColumns: Array[String],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[ExcelFilePartition].file
    val grid = ExcelDataSourceV2.sheetGrid(file, sheet, conf.value)
    val dataRows = if (hasHeaders && grid.nonEmpty) grid.tail else grid
    // Required columns are resolved against THIS FILE's own header, not
    // positionally against the first file's: workbooks with the same
    // columns in a different order read correctly, and a file missing a
    // required column is a per-file data error, never silent
    // column-swapping. A file that DUPLICATES a required name is
    // ambiguous — indexOf would silently serve the first occurrence's
    // data for both — so it errors per file, like a missing column
    // (the schema-time check covers the first file; later files get
    // this one).
    val fileColumns: IndexedSeq[String] =
      if (hasHeaders && grid.nonEmpty)
        grid.head.zipWithIndex.map { case (h, i) => Option(h).getOrElse(i.toString) }
      else allColumns.toIndexedSeq
    val ordinals = requiredColumns.map { c =>
      val occ = fileColumns.zipWithIndex.collect { case (n, i) if n == c => i }
      require(occ.nonEmpty,
        s"$file: column '$c' not found (file has ${fileColumns.mkString(", ")})")
      require(occ.size == 1,
        s"$file: column '$c' appears ${occ.size} times — ambiguous; " +
          "deduplicate the header row first")
      occ.head
    }
    new PartitionReader[InternalRow] {
      private val it = dataRows.iterator
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val row = it.next()
        current = InternalRow.fromSeq(ordinals.toSeq.map { i =>
          row.lift(i).flatMap(Option(_)).map(UTF8String.fromString).orNull
        })
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
