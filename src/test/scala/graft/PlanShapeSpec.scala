package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions (SURVEY.md §4): the scale guarantees are only
  * real if Catalyst actually produces the intended physical plans —
  * filters reach the parquet scan, projections prune columns, small dims
  * broadcast, top-k never global-sorts.
  */
class PlanShapeSpec extends GraftSpec {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("filter_comparison pushes predicates into the parquet scan") {
    val plan = finalPlan("filter_comparison")
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThan(l_quantity"),
      s"no pushed filters:\n$plan")
  }

  test("scan_pruned reads only the projected columns") {
    val plan = finalPlan("scan_pruned")
    val read = "ReadSchema: ([^\\n]*)".r.findFirstMatchIn(plan).map(_.group(1))
    assert(read.isDefined && read.get.contains("l_orderkey") &&
      !read.get.contains("l_extendedprice\",\"l_quantity") &&
      !read.get.contains("l_shipdate"),
      s"scan not pruned: $read")
  }

  test("join_broadcast uses a broadcast hash join (no shuffle of the dim)") {
    val plan = finalPlan("join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), s"not broadcast:\n$plan")
  }

  test("topk_global compiles to TakeOrderedAndProject (no global sort)") {
    val plan = finalPlan("topk_global")
    assert(plan.contains("TakeOrderedAndProject"), s"global sort used:\n$plan")
  }

  test("agg_groupby_pricing is a partial+final hash aggregate") {
    val plan = finalPlan("agg_groupby_pricing")
    assert(plan.contains("HashAggregate"), s"no hash agg:\n$plan")
    // partial aggregation before the exchange = map-side combine
    val firstAgg = plan.indexOf("HashAggregate")
    val exchange = plan.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0, s"plan shape unexpected:\n$plan")
  }

  test("llm_jaccard_pairs never plans a cartesian/nested-loop join") {
    val plan = finalPlan("llm_jaccard_pairs")
    assert(!plan.contains("CartesianProduct"), s"cartesian join:\n$plan")
  }
}
