package graft.queries

import graft.SparkSpec

/** Physical-plan assertions — the 100 TB design contract, checked, not
  * hoped for: filters reach the parquet scan, dimension joins broadcast,
  * aggregates partial-aggregate before the shuffle, top-k avoids a full
  * sort. Runs against sf0.001.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def planOf(name: String): String = {
    val df = Catalog.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q6_filter: predicates push down to the parquet scan") {
    val plan = planOf("q6_filter")
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("l_discount"), "discount predicate should reach the scan")
    // column pruning: the scan must not read l_tax/l_returnflag
    assert(plan.contains("ReadSchema"))
    assert(!plan.split("ReadSchema").last.split("\n").head.contains("l_tax"))
  }

  test("temporal queries: event_type filter pushes through the ts-normalization projection") {
    for (q <- Seq("temporal_asof", "temporal_range", "temporal_overlap", "text_bm25")) {
      val plan = planOf(q)
      if (q.startsWith("temporal")) {
        assert(plan.contains("PushedFilters:"), s"$q: no pushdown section")
        assert(plan.contains("EqualTo(event_type,"),
          s"$q: event_type equality must reach the parquet scan, not stop at the project")
      }
      // column pruning: none of these read the wide props column
      assert(!plan.split("ReadSchema").last.split("\n").head.contains("props"),
        s"$q: scan must prune unused columns")
    }
  }

  test("q_funnel: per-stage event_type equality reaches every parquet scan") {
    // The funnel reads events once per stage — cheap ONLY because each
    // scan keeps just its stage's rows; a filter stuck above the
    // ts-normalization projection would read the full table thrice.
    val plan = planOf("q_funnel")
    for (stage <- Seq("view", "click", "purchase"))
      assert(plan.contains(s"EqualTo(event_type,$stage)"),
        s"stage '$stage' filter must reach the scan")
    // ALL events scans (one per stage) must prune the wide props column
    val readSchemas = plan.split("ReadSchema").tail.map(_.split("\n").head)
    assert(readSchemas.nonEmpty)
    readSchemas.foreach(rs =>
      assert(!rs.contains("props"), s"a funnel scan reads props: $rs"))
  }

  test("q3_join_agg: dimension joins broadcast, no shuffle for nation/region") {
    val plan = planOf("q3_join_agg")
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q1_agg: hash aggregation with map-side partial aggregate") {
    val plan = planOf("q1_agg")
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("partial_"), "expected partial aggregation before the exchange")
  }

  test("q_topk: TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q_topk")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q_semijoin / q_antijoin use semi/anti join operators") {
    assert(planOf("q_semijoin").contains("LeftSemi"))
    assert(planOf("q_antijoin").contains("LeftAnti"))
  }

  test("whole-stage codegen spans cover the scan→filter→agg path") {
    // AQE wraps the plan pre-execution; codegen explain mode shows the
    // generated stages.
    val df = Catalog.queries("q6_filter")(spark, dir)
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("WholeStageCodegen"))
  }

  test("text_quality_model: the weight-model join itself is broadcast (tokens never shuffle for it)") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    // AQE's wrapper is a leaf node — tree traversal needs the static
    // plan (NewPlanSpec precedent)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try Catalog.queries("text_quality_model")(spark, dir)
      .queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    def onWeightKey(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      keys.exists(_.references.exists(_.name == "__qm_tok"))
    // the specific join ON THE TOKEN KEY must be broadcast — a generic
    // "some BroadcastHashJoin exists" check would stay green if the
    // model fell off the broadcast side while another join broadcast
    val broadcastOnTok = plan.collect {
      case j: BroadcastHashJoinExec if onWeightKey(j.leftKeys ++ j.rightKeys) => j
    }
    val shuffledOnTok = plan.collect {
      case j: SortMergeJoinExec if onWeightKey(j.leftKeys ++ j.rightKeys) => j
      case j: ShuffledHashJoinExec if onWeightKey(j.leftKeys ++ j.rightKeys) => j
    }
    assert(broadcastOnTok.nonEmpty && shuffledOnTok.isEmpty,
      s"the milli-weight model must join broadcast on __qm_tok:\n$plan")
  }

  test("q_approx_sketches: bound verdicts hold and exact counts are exact") {
    import org.apache.spark.sql.functions._
    val rows = Catalog.queries("q_approx_sketches")(spark, dir)
      .select(col("l_returnflag"), col("exact_parts"), col("parts_ok"), col("median_ok"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    val exact = graft.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val (got, partsOk, medianOk) = rows(k)
      assert(got == n, s"exact_parts for $k must be exact: $got vs $n")
      assert(partsOk, s"HLL estimate for $k outside the 3×rsd bound")
      assert(medianOk, s"approx median for $k outside the 45–55% rank band")
    }
  }
}
