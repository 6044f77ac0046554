package graft.queries

import graft.Tables
import graft.clean.Casts
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-level scalar preprocessing operators (SURVEY.md §2.3, P1–P8) run
  * against the driver testdata. Each query synthesizes the reference's
  * dirty-input shape from clean columns deterministically (so the DuckDB
  * oracle can rebuild the identical input) and then applies the operator.
  * All expressions are codegen'd built-ins — no UDFs on the hot path.
  */
object EtlScalarOps {
  import Catalog.{Entry, Q}

  // P1 — trim + empty→null (preprocessor.rs:28-52).
  private val p1: Q = (s, dir) => {
    val dirty = when(pmod(col("doc_id"), lit(5)) === 0, lit("   "))
      .otherwise(concat(lit("  "), col("source"), lit(" ")))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), Casts.trimEmptyToNull(dirty).as("source_clean"))
  }
  // Java-trim replay (all chars <= U+0020), matching Casts.trimEmptyToNull —
  // DuckDB's trim() strips only spaces, which would diverge on tab/CR
  // padding.
  private val p1Sql =
    """SELECT doc_id,
      |  nullif(regexp_replace(CASE WHEN doc_id % 5 = 0 THEN '   '
      |                             ELSE '  ' || source || ' ' END,
      |                        '^[\x00-\x20]+|[\x00-\x20]+$', '', 'g'), '')
      |    AS source_clean
      |FROM documents""".stripMargin

  // P2 — ensure_ints: whole-valued double column → BIGINT after an
  // integrality guard over the full column (casting.rs:206-219).
  private val p2: Q = (s, dir) => {
    val df = Tables.load(s, dir, "lineitem")
    require(Casts.allWholeNumbers(df, "l_quantity"),
      "ensure_ints guard: l_quantity has non-integral values")
    df.select(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast(LongType).as("qty_int"))
  }
  private val p2Sql =
    """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty_int
      |FROM lineitem""".stripMargin

  // P3 — ambivalent cast: stringified ints re-infer to BIGINT through the
  // bool→long→double→date→datetime cascade (casting.rs:11-46). The chosen
  // type is decided by a column-level lossless-cast guard, then applied.
  private val p3: Q = (s, dir) => {
    val df = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_size").cast(StringType).as("size_str"))
    val (dt, casted) = Casts.ambivalent(df, "size_str")
    require(dt == LongType, s"cascade picked $dt for stringified ints")
    df.select(col("p_partkey"), casted.as("size_reinferred"))
  }
  private val p3Sql =
    """SELECT p_partkey, CAST(CAST(p_size AS VARCHAR) AS BIGINT) AS size_reinferred
      |FROM part""".stripMargin

  // P5 — strict case-insensitive boolean parse (casting.rs:91-118).
  private val p5: Q = (s, dir) => {
    val boolStr = when(col("l_discount") > 0.05, lit("True")).otherwise(lit("FALSE"))
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        Casts.toBoolStrict(boolStr).as("discounted"))
  }
  private val p5Sql =
    """SELECT l_orderkey, l_linenumber,
      |  (lower(CASE WHEN l_discount > 0.05 THEN 'True' ELSE 'FALSE' END) = 'true')
      |    AS discounted
      |FROM lineitem""".stripMargin

  // P6 — int parse via float integrality ("42.0" → 42, "x.5" → null)
  // (casting.rs:120-140).
  private val p6: Q = (s, dir) => {
    val numStr = when(pmod(col("p_partkey"), lit(7)) === 0,
        concat(col("p_size").cast(StringType), lit(".5")))
      .otherwise(concat(col("p_size").cast(StringType), lit(".0")))
    Tables.load(s, dir, "part")
      .select(col("p_partkey"), Casts.toLongViaDouble(numStr).as("size_int"))
  }
  private val p6Sql =
    """SELECT p_partkey,
      |  CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE CAST(p_size AS BIGINT) END
      |    AS size_int
      |FROM part""".stripMargin

  // P7 — multi-format date parsing incl. the bare-year rule
  // (casting.rs:142-204, constants.rs:3-20, parsing.rs:36-44).
  // Dates are rendered to rotating text formats, then re-parsed.
  private val p7: Q = (s, dir) => {
    val d = col("o_orderdate")
    val rendered =
      when(pmod(col("o_orderkey"), lit(11)) === 0, date_format(d, "yyyy"))
        .when(pmod(col("o_orderkey"), lit(3)) === 0, date_format(d, "MM/dd/yyyy"))
        .when(pmod(col("o_orderkey"), lit(3)) === 1, date_format(d, "dd.MM.yyyy"))
        .otherwise(date_format(d, "yyyy-MM-dd"))
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), Casts.toDateMulti(rendered).as("parsed_date"))
  }
  private val p7Sql =
    """SELECT o_orderkey,
      |  CASE
      |    WHEN regexp_matches(s, '^\d{4}$') THEN make_date(CAST(s AS INT), 1, 1)
      |    ELSE CAST(coalesce(
      |      try_strptime(s, '%Y-%m-%d'), try_strptime(s, '%m/%d/%Y'),
      |      try_strptime(s, '%d.%m.%Y')) AS DATE)
      |  END AS parsed_date
      |FROM (
      |  SELECT o_orderkey,
      |    CASE
      |      WHEN o_orderkey % 11 = 0 THEN strftime(o_orderdate, '%Y')
      |      WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%m/%d/%Y')
      |      WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%d.%m.%Y')
      |      ELSE strftime(o_orderdate, '%Y-%m-%d')
      |    END AS s
      |  FROM orders) t""".stripMargin

  // P8 — subject-id stringification (preprocessor.rs:96-127).
  private val p8: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .select(col("c_custkey").cast(StringType).as("subject_id"), col("c_mktsegment"))
  private val p8Sql =
    """SELECT CAST(c_custkey AS VARCHAR) AS subject_id, c_mktsegment
      |FROM customer""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("p1_trim_nullify", p1, Some(p1Sql)),
    Entry("p2_ensure_ints", p2, Some(p2Sql)),
    Entry("p3_cast_cascade", p3, Some(p3Sql)),
    Entry("p5_cast_bool", p5, Some(p5Sql)),
    Entry("p6_cast_int_via_float", p6, Some(p6Sql)),
    Entry("p7_date_multiformat", p7, Some(p7Sql)),
    Entry("p8_subject_stringify", p8, Some(p8Sql)),
  )
}
