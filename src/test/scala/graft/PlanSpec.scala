package graft

import graft.queries.{CurationQueries, Relational, SimQueries, StreamQueries}

/** Physical-plan shape assertions: the scale claims in the Scaladoc
  * (broadcast here, WindowGroupLimit there, pushdown everywhere) are
  * cheap to regress silently — a changed join hint or a new column
  * reference flips the plan without failing any value-level test.
  * These specs pin the load-bearing plan features.
  */
class PlanSpec extends SparkSpec {

  test("sample_stratified pushes partial top-k before the exchange") {
    val plan = planOf(CurationQueries.sampleStratified(spark, sf))
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("q_window rank filter compiles to WindowGroupLimit before the cumsum") {
    val plan = planOf(Relational.qWindow(spark, sf))
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("stream_enrich joins the dimension side by broadcast") {
    val plan = planOf(StreamQueries.streamEnrich(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("q_filter_project reaches the scan with pushed filters and pruned schema") {
    val plan = planOf(Relational.qFilterProject(spark, sf))
    assert(plan.contains("PushedFilters: ["), plan.take(800))
    assert(!plan.contains("PushedFilters: []"), "filters must actually push")
  }

  test("knn_brute broadcasts the query side, not the corpus") {
    val plan = planOf(SimQueries.knnBrute(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      plan.take(800))
  }

  test("text_quality tokenizes once per row (single array_remove in plan)") {
    val plan = planOf(graft.queries.TextQueries.textQuality(spark, sf))
    val n = "array_remove".r.findAllIn(plan).length
    assert(n === 1, s"expected 1 tokenization, found $n")
  }
}
