package graft.queries

import graft.Tables
import graft.functions.DateTimeFns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Strategy operators (SURVEY.md §2.4, T1–T7) demonstrated over the
  * driver testdata. The full config-driven strategy implementations live
  * in `graft.strategy`; these queries exercise the same column algebra in
  * oracle-checkable form. All lookups are broadcast-map shaped — at
  * 100 TB the dictionaries stay small (ontology-sized) so a broadcast
  * hash join / when-chain is the right physical plan; nothing here
  * shuffles except the declared aggregations.
  */
object StrategyOps {
  import Catalog.{Entry, Q}

  // T1 — alias map: explicit value→alias substitution, alias-to-null
  // allowed, misses pass through (alias_map.rs:53-135).
  private val t1: Q = (s, dir) => {
    val c = col("l_returnflag")
    val aliased = when(c === "R", lit("returned"))
      .when(c === "A", lit("accepted"))
      .when(c === "N", lit(null).cast(StringType))
      .otherwise(c)
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), aliased.as("flag_alias"))
  }
  private val t1Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_returnflag = 'R' THEN 'returned'
      |       WHEN l_returnflag = 'A' THEN 'accepted'
      |       WHEN l_returnflag = 'N' THEN NULL
      |       ELSE l_returnflag END AS flag_alias
      |FROM lineitem""".stripMargin

  // T2 — mapping normalization keyed on lower(trim(value))
  // (mapping.rs:62-278); unmapped values would accumulate to an error in
  // the strategy layer.
  private val t2: Q = (s, dir) => {
    val key = lower(trim(col("c_mktsegment")))
    val mapped = when(key === "building", lit("B"))
      .when(key === "automobile", lit("A"))
      .when(key === "machinery", lit("M"))
      .when(key === "household", lit("H"))
      .when(key === "furniture", lit("F"))
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"), mapped.as("segment_code"))
  }
  private val t2Sql =
    """SELECT c_custkey,
      |  CASE lower(trim(c_mktsegment))
      |    WHEN 'building' THEN 'B' WHEN 'automobile' THEN 'A'
      |    WHEN 'machinery' THEN 'M' WHEN 'household' THEN 'H'
      |    WHEN 'furniture' THEN 'F' END AS segment_code
      |FROM customer""".stripMargin

  // T3 — age→ISO-8601: integral ages 0..150 → 'P{n}Y'; ISO durations pass
  // through; others null (age_to_iso8601.rs:44-158).
  private val t3: Q = (s, dir) => {
    val age = col("p_size")
    val iso = when(age.between(0, 150), concat(lit("P"), age.cast(StringType), lit("Y")))
    Tables.load(s, dir, "part").select(col("p_partkey"), iso.as("iso_age"))
  }
  private val t3Sql =
    """SELECT p_partkey,
      |  CASE WHEN p_size BETWEEN 0 AND 150
      |       THEN 'P' || CAST(p_size AS VARCHAR) || 'Y' END AS iso_age
      |FROM part""".stripMargin

  // T4 — date→age: exact calendar Y/M/D difference (order date as the
  // "birth" analog, ship date as the event), emitted as ISO-8601
  // duration (date_to_age.rs:278-322). The DOB side arrives via a
  // shuffle join on orderkey — at scale this is the fact-fact join AQE
  // manages; the reference instead materializes a driver-side map.
  private val t4: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate").cast("date").as("ship"))
    val ord = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("dob"))
    // The synthetic data has ship dates on both sides of the order date;
    // the reference errors on negative ages, so the query diffs
    // earlier → later (the strategy layer keeps the error semantics).
    // Native CalendarAgeIso — the codegen'd hot path the strategy uses.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.functions.GraftExtensions.calendar_age_iso(
          least(col("dob"), col("ship")), greatest(col("dob"), col("ship"))).as("age_iso"))
  }
  private val t4Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN y = 0 AND m = 0 AND d = 0 THEN 'P0Y'
      |       ELSE 'P' || CASE WHEN y > 0 THEN y || 'Y' ELSE '' END
      |                || CASE WHEN m > 0 THEN m || 'M' ELSE '' END
      |                || CASE WHEN d > 0 THEN d || 'D' ELSE '' END
      |  END AS age_iso
      |FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    date_part('year',  age(g, l)) AS y,
      |    date_part('month', age(g, l)) AS m,
      |    date_part('day',   age(g, l)) AS d
      |  FROM (
      |    SELECT l_orderkey, l_linenumber,
      |      least(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) AS l,
      |      greatest(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) AS g
      |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t0) t""".stripMargin

  // T5 — regex scan of free text → explode → per-token aggregation
  // (multi_hpo_col_expansion.rs:46-230 does this for HP:\d{7} then pivots
  // to dynamic boolean columns; the dynamic pivot lives in
  // graft.strategy.MultiTokenExpansion).
  private val t5: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(explode(regexp_extract_all(col("text"),
        lit("(spark|join|window|merge)"), lit(1))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
  private val t5Sql =
    """SELECT token, count(*) AS n FROM (
      |  SELECT unnest(regexp_extract_all(text, '(spark|join|window|merge)', 1)) AS token
      |  FROM documents) t
      |GROUP BY token""".stripMargin

  // T5b — the pivoted shape: per-document presence flags (static column
  // set here so the oracle is expressible; the strategy handles the
  // data-driven column set).
  private val t5b: Q = (s, dir) => {
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit("(spark|join|window|merge)"), lit(1)).as("toks"))
    toks.select(col("doc_id"),
      array_contains(col("toks"), "spark").as("has_spark"),
      array_contains(col("toks"), "join").as("has_join"),
      array_contains(col("toks"), "window").as("has_window"),
      array_contains(col("toks"), "merge").as("has_merge"))
  }
  private val t5bSql =
    """SELECT doc_id,
      |  list_contains(regexp_extract_all(text, '(spark|join|window|merge)', 1), 'spark')  AS has_spark,
      |  list_contains(regexp_extract_all(text, '(spark|join|window|merge)', 1), 'join')   AS has_join,
      |  list_contains(regexp_extract_all(text, '(spark|join|window|merge)', 1), 'window') AS has_window,
      |  list_contains(regexp_extract_all(text, '(spark|join|window|merge)', 1), 'merge')  AS has_merge
      |FROM documents""".stripMargin

  // T6 — ontology normalization: label → CURIE through a broadcast
  // bidict (ontology_normaliser.rs:61-141). The nation table plays the
  // ontology: label 'NATION_x' (case-insensitively) → curie 'NAT:x'.
  private val t6: Q = (s, dir) => {
    val dict = broadcast(Tables.load(s, dir, "nation")
      .select(lower(col("n_name")).as("label_key"),
        concat(lit("NAT:"), col("n_nationkey").cast(StringType)).as("curie")))
    Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), lower(col("n_name")).as("label_key"))
      .join(dict, Seq("label_key"))
      .select(col("c_custkey"), col("curie"))
  }
  private val t6Sql =
    """SELECT c_custkey, 'NAT:' || CAST(n_nationkey AS VARCHAR) AS curie
      |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  // T7 — membership splitter: one column fans out into two typed columns
  // by dictionary membership, source dropped (hpo_disease_splitter.rs:51-150).
  private val t7: Q = (s, dir) => {
    val action = Set("purchase", "signup", "upgrade")
    val c = col("event_type")
    val isAction = c.isin(action.toSeq: _*)
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        when(isAction, c).as("type_action"),
        when(!isAction, c).as("type_status"))
  }
  private val t7Sql =
    """SELECT event_id,
      |  CASE WHEN event_type IN ('purchase','signup','upgrade') THEN event_type END AS type_action,
      |  CASE WHEN event_type NOT IN ('purchase','signup','upgrade') THEN event_type END AS type_status
      |FROM events""".stripMargin

  // f_iso_duration_seconds — the native Catalyst expression
  // (graft.functions.IsoDurationSeconds, codegen'd) over generated
  // ISO-8601 durations; the oracle mirrors the documented
  // year=365.25d / month=30.4375d convention arithmetically.
  private val fIso: Q = (s, dir) => {
    val iso = when(pmod(col("p_partkey"), lit(5)) === 0, lit("P1DT2H30M"))
      .otherwise(concat(lit("P"), col("p_size").cast(StringType), lit("Y")))
    Tables.load(s, dir, "part")
      .select(col("p_partkey"),
        graft.functions.GraftExtensions.iso_duration_seconds(iso).as("dur_secs"))
  }
  private val fIsoSql =
    """SELECT p_partkey,
      |  CASE WHEN p_partkey % 5 = 0 THEN 95400
      |       ELSE CAST(p_size AS BIGINT) * 31557600 END AS dur_secs
      |FROM part""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("f_iso_duration_seconds", fIso, Some(fIsoSql)),
    Entry("t1_alias_map", t1, Some(t1Sql)),
    Entry("t2_mapping_normalize", t2, Some(t2Sql)),
    Entry("t3_age_to_iso8601", t3, Some(t3Sql)),
    Entry("t4_date_to_age", t4, Some(t4Sql)),
    Entry("t5_regex_explode", t5, Some(t5Sql)),
    Entry("t5_pivot_flags", t5b, Some(t5bSql)),
    Entry("t6_ontology_normalize", t6, Some(t6Sql)),
    Entry("t7_membership_split", t7, Some(t7Sql)),
  )
}
