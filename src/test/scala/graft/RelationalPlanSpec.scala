package graft

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

/** Plan-shape assertions: the promises the Scaladoc makes about scale
  * behavior must be visible in the plans Catalyst actually produces. */
class RelationalPlanSpec extends GraftSpec {

  private def analyzed(q: String) =
    SparkEntry.queries(q)(spark, sf).queryExecution.analyzed

  private def physical(q: String) =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q9 global top-N compiles to TakeOrderedAndProject (no full sort)") {
    assert(physical("q9_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q2 predicates reach the parquet scan as pushed filters") {
    val plan = physical("q2_filter_project")
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("GreaterThanOrEqual(p_size"))
  }

  test("q3 carries no broadcast hint (customer is fact-scale)") {
    val hints = analyzed("q3_join_agg").collect { case h: ResolvedHint => h }
    assert(hints.isEmpty,
      s"q3 must not hint broadcasts; found: ${hints.map(_.simpleString(80))}")
  }

  test("q5 broadcast hints cover only fixed-size dims (nation, region)") {
    val hints = analyzed("q5_multi_join").collect { case h: ResolvedHint => h }
    assert(hints.size == 2)
    hints.foreach { h =>
      val leafs = h.child.collectLeaves().mkString
      assert(leafs.contains("nation") || leafs.contains("region"),
        s"unexpected broadcast hint over: $leafs")
    }
    assert(!analyzed("q5_multi_join").toString.linesIterator
      .exists(l => l.contains("ResolvedHint") && l.contains("customer")))
  }

  test("q22 latest-by-key is a single window pass, not a max-ts self-join") {
    val plan = physical("q22_latest_by_key")
    assert(plan.contains("Window") || plan.contains("WindowGroupLimit"))
    assert(!plan.contains("Join"),
      s"q22 must not self-join:\n${plan.take(1500)}")
  }

  test("every oracle key has a query; every query returns rows at sf0.001") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle without query: $k")
    }
    // spot-check a few cheap ones for non-vacuousness
    Seq("q2_filter_project", "q10_anti_join", "etl_clean").foreach { k =>
      assert(SparkEntry.queries(k)(spark, sf).limit(1).count() == 1,
        s"$k returned 0 rows — vacuous oracle check")
    }
  }
}
