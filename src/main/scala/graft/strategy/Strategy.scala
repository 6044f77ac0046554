package graft.strategy

import graft.model.Cdf

/** Config-ordered whole-table transform (reference
  * `phenoxtract/src/transform/strategies/traits.rs:16-30`): guard, then
  * run over ALL tables at once (cross-table strategies like DateToAge
  * need the full set).
  */
trait Strategy {
  def name: String

  /** Structural guard — are the required contexts present / coherent? */
  def isValid(tables: Seq[Cdf]): Boolean = true

  protected def internalTransform(tables: Seq[Cdf]): Seq[Cdf]

  final def transform(tables: Seq[Cdf]): Seq[Cdf] = {
    require(isValid(tables), s"strategy $name: invalid input tables")
    internalTransform(tables)
  }
}

/** Error-accumulation semantics shared by the mapping-shaped strategies
  * (reference `mapping.rs:202-277`, `age_to_iso8601.rs:92-157`,
  * `date_to_age.rs:106-215`): offending DISTINCT values are gathered
  * across all tables with a cheap second-pass filter+collect, then the
  * strategy fails once with the complete set — never throw from inside
  * a row-level expression.
  */
final case class MappingException(strategy: String, badValues: Seq[String], hint: String = "")
    extends RuntimeException(
      s"strategy $strategy: unmappable value(s): ${badValues.mkString("'", "', '", "'")}" +
        (if (hint.nonEmpty) s" — $hint" else ""))
