package graft.model

import scala.util.matching.Regex

/** Column identifier resolution (reference
  * `phenoxtract/src/config/table_context.rs:85-89, 204-222`):
  * an identifier resolves to zero or more physical columns of a table.
  */
sealed trait Identifier {
  /** Physical columns of `columns` this identifier selects, in table
    * order (reference semantics: exact match / regex find / set
    * membership).
    */
  def resolve(columns: Seq[String]): Seq[String] = this match {
    case Identifier.Single(name) =>
      // A Single identifier with no exact match is retried as a regex
      // (reference behavior, CONFIG_YAML_README.md:231-233).
      val exact = columns.filter(_ == name)
      if (exact.nonEmpty) exact
      else scala.util.Try(name.r).toOption
        .map(re => columns.filter(c => re.findFirstIn(c).isDefined))
        .getOrElse(Seq.empty)
    case Identifier.Rx(re)       => columns.filter(c => re.findFirstIn(c).isDefined)
    case Identifier.Multi(names) => columns.filter(names.contains)
  }
}
object Identifier {
  final case class Single(name: String) extends Identifier
  final case class Rx(re: Regex) extends Identifier {
    override def equals(o: Any): Boolean = o match {
      case Rx(other) => other.regex == re.regex
      case _         => false
    }
    override def hashCode(): Int = re.regex.hashCode
  }
  final case class Multi(names: Seq[String]) extends Identifier
  def regex(pattern: String): Rx = Rx(pattern.r)
}

/** Requested output type of an alias-mapped column (reference
  * `table_context.rs:226-246`).
  */
sealed trait OutputDataType
object OutputDataType {
  case object Bool extends OutputDataType
  case object Str extends OutputDataType
  case object F64 extends OutputDataType
  case object I64 extends OutputDataType
  case object Date extends OutputDataType
  case object Datetime extends OutputDataType

  def toSpark(t: OutputDataType): org.apache.spark.sql.types.DataType = t match {
    case Bool     => org.apache.spark.sql.types.BooleanType
    case Str      => org.apache.spark.sql.types.StringType
    case F64      => org.apache.spark.sql.types.DoubleType
    case I64      => org.apache.spark.sql.types.LongType
    case Date     => org.apache.spark.sql.types.DateType
    case Datetime => org.apache.spark.sql.types.TimestampType
  }
}

/** Value substitution map for one series: raw cell value → alias
  * (None = map to null), plus the type the column should be cast to
  * afterwards. Trimming is NOT automatic: call [[normalized]] after
  * construction (ConfigLoader and AliasMapStrategy both do) — the
  * reference trims on construction (`table_context.rs:249-270`), so a
  * directly-built map with a padded key like "yes " will silently
  * never match trimmed cells until normalized.
  */
final case class AliasMap(
    entries: Map[String, Option[String]],
    outputType: OutputDataType = OutputDataType.Str) {
  def normalized: AliasMap =
    copy(entries = entries.map { case (k, v) => k.trim -> v.map(_.trim) })
}

/** Per-series semantic annotation (reference `table_context.rs:283-302`):
  * `headerContext` says what the column NAME means; `dataContext` what
  * the CELLS mean; `buildingBlockId` groups related columns into one
  * logical record across (possibly) several tables.
  */
final case class SeriesContext(
    identifier: Identifier,
    headerContext: Context = Context.NoContext,
    dataContext: Context = Context.NoContext,
    fillMissing: Option[String] = None,
    aliasMap: Option[AliasMap] = None,
    buildingBlockId: Option[String] = None)

/** Table-level context: name + per-series annotations (reference
  * `table_context.rs:27-31`).
  */
final case class TableContext(name: String, seriesContexts: Seq[SeriesContext]) {

  /** All (column, seriesContext) bindings against a physical column
    * list, in series order.
    */
  def bindings(columns: Seq[String]): Seq[(String, SeriesContext)] =
    for {
      sc  <- seriesContexts
      col <- sc.identifier.resolve(columns)
    } yield (col, sc)

  def withSeries(sc: SeriesContext): TableContext =
    copy(seriesContexts = seriesContexts :+ sc)
}
