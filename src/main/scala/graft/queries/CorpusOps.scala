package graft.queries

import graft.Tables
import graft.ops.{QualityModel, TokenBudget}
import org.apache.spark.sql.functions._

/** Corpus-curation queries: model-based quality filtering and
  * token-budget mixing — both with EXACT integer formulations so the
  * DuckDB oracle reproduces them bit-for-bit (milli-unit logits;
  * integral token budgets over an md5-shuffled order).
  */
object CorpusOps {
  import Catalog.{Entry, Q}

  // fasttext-style linear quality model: stopword-ish tokens vote for
  // "real prose", rare/garbage markers vote against. Milli-weights keep
  // the logit exact-integer on both engines.
  private val weights: Seq[(String, Long)] = Seq(
    "the" -> 400L, "and" -> 300L, "of" -> 250L, "to" -> 200L, "a" -> 150L,
    "in" -> 150L, "is" -> 100L, "der" -> 350L, "und" -> 300L, "le" -> 350L,
    "la" -> 300L, "et" -> 250L, "el" -> 350L, "los" -> 300L,
    "lorem" -> -800L, "ipsum" -> -800L, "click" -> -500L, "cookie" -> -500L)
  private val bias = -700L

  private val qualityModel: Q = (s, dir) =>
    QualityModel.scoreLinear(
      Tables.load(s, dir, "documents"), "doc_id", "text", weights.toMap, bias)
      .select(col("doc_id"), col("milli_logit"), col("kept"))
  private val qualityModelSql = {
    val values = weights.map { case (t, w) => s"('$t', ${w}::BIGINT)" }.mkString(", ")
    s"""WITH w(tok, mw) AS (VALUES $values),
       |toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents WHERE trim(text) <> ''),
       |s AS (
       |  SELECT doc_id, sum(mw) AS sw FROM toks JOIN w ON toks.tok = w.tok
       |  GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST($bias + coalesce(s.sw, 0) AS BIGINT) AS milli_logit,
       |  ($bias + coalesce(s.sw, 0)) >= 0 AS kept
       |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin
  }

  // Token-budget mix: "4k chars of src0, everything of src1, a sliver
  // of src2" — deterministic md5 order, kept while the running total
  // is under budget (see ops.TokenBudget for the sliced scale plan;
  // the oracle is the plain window formulation).
  private val budgets = Map("src0" -> 4000L, "src1" -> 1000000L, "src2" -> 600L)

  private val tokenBudget: Q = (s, dir) =>
    TokenBudget.sample(
      Tables.load(s, dir, "documents").select("doc_id", "source", "n_chars"),
      keyCol = "doc_id", groupCol = "source", weightCol = "n_chars",
      budgets = budgets)
  private val tokenBudgetSql = {
    val cases = budgets.toSeq.sortBy(_._1)
      .map { case (g, b) => s"WHEN '$g' THEN ${b}::BIGINT" }.mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id, source, n_chars,
       |    md5(CAST(doc_id AS VARCHAR)) AS h,
       |    CASE source $cases ELSE NULL END AS budget
       |  FROM documents
       |  WHERE source IN (${budgets.keys.toSeq.sorted.map(g => s"'$g'").mkString(", ")})
       |    AND n_chars IS NOT NULL AND doc_id IS NOT NULL),
       |c AS (
       |  SELECT *, coalesce(sum(n_chars) OVER (
       |    PARTITION BY source ORDER BY h, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
       |  FROM t)
       |SELECT doc_id, source, n_chars FROM c WHERE before < budget""".stripMargin
  }

  val entries: Seq[Entry] = Seq(
    Entry("text_quality_model", qualityModel, Some(qualityModelSql)),
    Entry("text_token_budget", tokenBudget, Some(tokenBudgetSql)),
  )
}
