package graft.strategy

import graft.model._
import org.apache.spark.sql.functions._

/** T2 — context-targeted synonym normalization (reference
  * `phenoxtract/src/transform/strategies/mapping.rs:62-278`): cells of
  * every column whose data context matches `targetKind` are mapped via
  * `lower(trim(value))`; **all unmapped non-null values across all
  * tables are collected first and the strategy fails once** with the
  * complete set (reference error-accumulation semantics
  * `mapping.rs:202-277`).
  *
  * The unmapped scan is a distinct-collect per matching column — a
  * second cheap pass over one column, not a per-row throw.
  */
final case class MappingStrategy(
    name: String,
    synonymMap: Map[String, String],
    targetKind: ContextKind) extends Strategy {

  private val norm: Map[String, String] =
    synonymMap.map { case (k, v) => k.trim.toLowerCase -> v }

  protected def internalTransform(tables: Seq[Cdf]): Seq[Cdf] = {
    // Pass 1: accumulate every unmapped distinct value across tables.
    val bad = tables.flatMap { cdf =>
      cdf.columnsOfKind(targetKind).flatMap { c =>
        cdf.df
          .select(lower(trim(col(c).cast("string"))).as("v"))
          .filter(col("v").isNotNull && !col("v").isin(norm.keys.toSeq: _*))
          .distinct().limit(50)
          .collect().map(_.getString(0))
      }
    }.distinct
    if (bad.nonEmpty)
      throw MappingException(name, bad,
        hint = s"known keys: ${norm.keys.toSeq.sorted.mkString(", ")}")

    // Pass 2: apply the when-chain mapping.
    tables.map { cdf =>
      val df = cdf.columnsOfKind(targetKind).foldLeft(cdf.df) { (acc, c) =>
        val key = lower(trim(col(c).cast("string")))
        val mapped = norm.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
          case (accExpr, (k, v)) =>
            Some(accExpr.fold(when(key === k, lit(v)))(_.when(key === k, lit(v))))
        }.map(_.otherwise(lit(null).cast("string"))).getOrElse(col(c))
        acc.withColumn(c, mapped)
      }
      cdf.copy(df = df)
    }
  }
}

object MappingStrategy {

  /** Built-in subject-sex normalization (reference `mapping.rs:92-131`). */
  def defaultSex: MappingStrategy = MappingStrategy(
    "default_sex_mapping",
    Map(
      "m" -> "MALE", "male" -> "MALE", "man" -> "MALE",
      "f" -> "FEMALE", "female" -> "FEMALE", "woman" -> "FEMALE",
      "diverse" -> "OTHER_SEX", "intersex" -> "OTHER_SEX", "other" -> "OTHER_SEX",
      "other_sex" -> "OTHER_SEX", "unknown_sex" -> "UNKNOWN_SEX"),
    ContextKind.KSubjectSex)

  /** Built-in vital-status normalization (reference `mapping.rs:135-178`). */
  def defaultVitalStatus: MappingStrategy = MappingStrategy(
    "default_vital_status_mapping",
    Map(
      "yes" -> "ALIVE", "living" -> "ALIVE", "alive" -> "ALIVE",
      "no" -> "DECEASED", "dead" -> "DECEASED", "deceased" -> "DECEASED",
      "unknown" -> "UNKNOWN_STATUS", "no data" -> "UNKNOWN_STATUS",
      "unknown_status" -> "UNKNOWN_STATUS"),
    ContextKind.KVitalStatus)
}
