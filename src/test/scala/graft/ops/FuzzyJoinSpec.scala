package graft.ops

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("finds exactly the pairs within edit distance 1; shared-variant ED-2 candidates filtered") {
    val l = Seq("abc", "hello", "x", "kitten").toDF("s")
    val r = Seq(
      "abd",    // substitution of abc → 1
      "abxc",   // insertion into abc → 1
      "ab",     // deletion from abc → 1
      "abc",    // equal → 0
      "bcd",    // shares deletion variant "bc" with abc but ED=2 → must be filtered
      "hallo",  // substitution → 1
      "y",      // ED 1 from x? x→y substitution → 1
      "sitting" // ED 3 from kitten → excluded
    ).toDF("s")
    val out = FuzzyJoin.withinEditDistance1(l, "s", r, "s")
      .as[(String, String, Int)].collect().toSet
    assert(out === Set(
      ("abc", "abd", 1), ("abc", "abxc", 1), ("abc", "ab", 1), ("abc", "abc", 0),
      ("hello", "hallo", 1), ("x", "y", 1)))
  }

  test("no cross join in the plan; candidate generation is linear in string length") {
    val l = Seq("alpha").toDF("s")
    val plan = FuzzyJoin.withinEditDistance1(l, "s", l, "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must stay an equi-join on deletion variants:\n$plan")
  }
}
