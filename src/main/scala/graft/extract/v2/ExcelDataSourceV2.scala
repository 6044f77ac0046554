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
    val files = ExcelDataSourceV2.listFiles(options.get("path"))
    require(files.nonEmpty, s"no .xlsx files under ${options.get("path")}")
    val sheet = ExcelDataSourceV2.sheetOf(options)
    val hasHeaders = ExcelDataSourceV2.hasHeadersOf(options)
    val grid = ExcelDataSourceV2.sheetGrid(files.head, sheet)
    val width = grid.map(_.length).maxOption.getOrElse(0)
    val names =
      if (hasHeaders && grid.nonEmpty)
        grid.head.padTo(width, null).zipWithIndex.map { case (h, i) =>
          Option(h).getOrElse(i.toString)
        }
      else (0 until width).map(_.toString)
    StructType(names.map(StructField(_, StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    ExcelTable(schema, new CaseInsensitiveStringMap(properties))
}

object ExcelDataSourceV2 {
  def listFiles(path: String): Seq[String] = {
    require(path != null, "option 'path' is required")
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().toSeq.map(_.getPath).filter(_.endsWith(".xlsx")).sorted
    else Seq(f.getPath)
  }
  def sheetOf(options: CaseInsensitiveStringMap): String = {
    val s = options.get("sheet")
    require(s != null, "option 'sheet' is required")
    s
  }
  def hasHeadersOf(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean("has_headers", true)

  def sheetGrid(file: String, sheet: String): Vector[Vector[String]] =
    ExcelSource.readWorkbook(file).getOrElse(sheet,
      throw new IllegalArgumentException(s"$file: sheet '$sheet' not found"))
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
    s"ExcelScan(files=${ExcelDataSourceV2.listFiles(options.get("path")).size}, " +
      s"columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] =
    ExcelDataSourceV2.listFiles(options.get("path"))
      .map(f => ExcelFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    ExcelReaderFactory(
      ExcelDataSourceV2.sheetOf(options),
      ExcelDataSourceV2.hasHeadersOf(options),
      fullSchema.fieldNames,
      required.fieldNames)
}

final case class ExcelFilePartition(file: String) extends InputPartition

/** Executor-side reader: one workbook file per partition; only the
  * required column ordinals are materialized into rows.
  */
final case class ExcelReaderFactory(sheet: String, hasHeaders: Boolean,
    allColumns: Array[String], requiredColumns: Array[String])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[ExcelFilePartition].file
    val grid = ExcelDataSourceV2.sheetGrid(file, sheet)
    val dataRows = if (hasHeaders && grid.nonEmpty) grid.tail else grid
    // Required columns are resolved against THIS FILE's own header, not
    // positionally against the first file's: workbooks with the same
    // columns in a different order read correctly, and a file missing a
    // required column is a per-file data error, never silent
    // column-swapping.
    val fileColumns: IndexedSeq[String] =
      if (hasHeaders && grid.nonEmpty)
        grid.head.zipWithIndex.map { case (h, i) => Option(h).getOrElse(i.toString) }
      else allColumns.toIndexedSeq
    val ordinals = requiredColumns.map { c =>
      val i = fileColumns.indexOf(c)
      require(i >= 0,
        s"$file: column '$c' not found (file has ${fileColumns.mkString(", ")})")
      i
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
