package graft.strategy

import graft.model._
import graft.ontology.BiDictLibrary
import org.apache.spark.sql.functions._

/** T7 — split an `HpoOrDisease` column into `<col>_hpo` and
  * `<col>_disease` by dictionary-library membership, HPO winning ties;
  * unknown non-null values error; the source column is dropped
  * (reference
  * `phenoxtract/src/transform/strategies/hpo_disease_splitter.rs:51-150`).
  */
final case class HpoDiseaseSplitterStrategy(
    library: BiDictLibrary,
    hpoResourceId: String = "hp",
    diseaseResourceId: String = "mondo") extends Strategy {
  val name = "hpo_disease_splitter"

  override def isValid(tables: Seq[Cdf]): Boolean =
    tables.exists(_.columnsOfKind(ContextKind.KHpoOrDisease).nonEmpty)

  protected def internalTransform(tables: Seq[Cdf]): Seq[Cdf] = {
    val spark = tables.head.df.sparkSession
    val bc = spark.sparkContext.broadcast(library)
    val classify = udf { (v: String) =>
      if (v == null) null
      else if (bc.value.memberOf(hpoResourceId, v)) "hpo"
      else if (bc.value.memberOf(diseaseResourceId, v)) "disease"
      else "unknown"
    }

    val bad = tables.flatMap { cdf =>
      cdf.columnsOfKind(ContextKind.KHpoOrDisease).flatMap { c =>
        cdf.df.select(col(c).cast("string").as("v"))
          .filter(col("v").isNotNull && classify(col("v")) === "unknown")
          .distinct().limit(50)
          .collect().map(_.getString(0))
      }
    }.distinct
    if (bad.nonEmpty)
      throw MappingException(name, bad, "values in neither the HPO nor the disease ontology")

    tables.map { cdf =>
      val targets = cdf.bindings.filter(_._2.dataContext.kind == ContextKind.KHpoOrDisease)
      if (targets.isEmpty) cdf
      else {
        var df = cdf.df
        var ctx = cdf.context
        targets.foreach { case (c, sc) =>
          val cls = classify(col(c).cast("string"))
          df = df
            .withColumn(s"${c}_hpo", when(cls === "hpo", col(c)))
            .withColumn(s"${c}_disease", when(cls === "disease", col(c)))
            .drop(c)
          ctx = ctx.copy(seriesContexts =
            ctx.seriesContexts.filterNot(_ == sc) ++ Seq(
              sc.copy(identifier = Identifier.Single(s"${c}_hpo"),
                dataContext = Context.Hpo),
              sc.copy(identifier = Identifier.Single(s"${c}_disease"),
                dataContext = Context.Disease)))
        }
        Cdf(ctx, df)
      }
    }
  }
}
