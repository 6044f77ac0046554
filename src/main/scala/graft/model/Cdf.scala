package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ContextualizedDataFrame: a Spark DataFrame plus its semantic table
  * context (reference
  * `phenoxtract/src/extract/contextualized_data_frame.rs:29-32`).
  *
  * The context is a driver-side metadata sidecar, deliberately NOT
  * column-level `Metadata`: identifiers can be regexes/multi-column and
  * strategies mutate contexts mid-pipeline (SURVEY.md §1.4).
  */
final case class Cdf(context: TableContext, df: DataFrame) {

  /** Physical columns bound to each series context, in series order. */
  def bindings: Seq[(String, SeriesContext)] = context.bindings(df.columns.toSeq)

  /** Columns whose data context has the given kind. */
  def columnsOfKind(kind: ContextKind): Seq[String] =
    bindings.collect { case (c, sc) if sc.dataContext.kind == kind => c }

  /** Columns matching a data-context predicate. */
  def columnsWhere(p: SeriesContext => Boolean): Seq[String] =
    bindings.collect { case (c, sc) if p(sc) => c }

  /** The unique SubjectId column (validator guarantees exactly one). */
  def subjectIdColumn: String = columnsOfKind(ContextKind.KSubjectId).head

  /** Within a building block, the 0-or-1 column with one of the given
    * data-context kinds; error on >1 (reference
    * `contextualized_data_frame.rs:166-282`).
    */
  def singleLinkedColumn(blockId: Option[String], kinds: Set[ContextKind]): Option[String] = {
    val hits = bindings.collect {
      case (c, sc) if sc.buildingBlockId == blockId && kinds.contains(sc.dataContext.kind) => c
    }
    if (hits.size > 1)
      throw new IllegalStateException(
        s"expected at most one column with contexts $kinds in block $blockId of " +
          s"'${context.name}', found ${hits.mkString(", ")}")
    hits.headOption
  }

  def withColumnContext(sc: SeriesContext): Cdf = copy(context = context.withSeries(sc))
}

object Cdf {

  /** Construction-time validation (reference
    * `validation/contextualised_dataframe_validation.rs:9-90`,
    * `validation/table_context_validation.rs:45-64`):
    *   1. exactly one SubjectId column per table;
    *   2. no nulls in the SubjectId column;
    *   3. at most one SeriesContext per physical column;
    *   4. no dangling SeriesContexts (every context resolves to >=1
    *      column) — `Multi`/`Rx` identifiers may legally resolve to 0.
    */
  def validated(context: TableContext, df: DataFrame): Cdf = {
    val cols = df.columns.toSeq
    val bound = context.bindings(cols)

    val subjectCols = bound.collect {
      case (c, sc) if sc.dataContext.kind == ContextKind.KSubjectId => c
    }
    require(subjectCols.size == 1,
      s"table '${context.name}' must have exactly one SubjectId column, " +
        s"found ${subjectCols.size} (${subjectCols.mkString(", ")})")

    val dupCols = bound.groupBy(_._1).filter(_._2.size > 1).keys
    require(dupCols.isEmpty,
      s"table '${context.name}': multiple SeriesContexts bind column(s) ${dupCols.mkString(", ")}")

    context.seriesContexts.foreach {
      case SeriesContext(id @ Identifier.Single(n), _, _, _, _, _) =>
        require(id.resolve(cols).nonEmpty,
          s"table '${context.name}': SeriesContext identifies missing column '$n'")
      case _ => () // regex / multi may resolve to zero columns
    }

    val nullSubjects = df.filter(col(subjectCols.head).isNull).limit(1).count()
    require(nullSubjects == 0,
      s"table '${context.name}': SubjectId column '${subjectCols.head}' contains nulls")

    Cdf(context, df)
  }
}
