package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Physical-plan shape assertions (SURVEY.md §4 expectations): the
  * performance properties the engine is designed around must survive
  * refactors — pushdown reaching the scan, broadcasts on small sides,
  * TakeOrderedAndProject for top-k, no stray exchanges.
  */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfSmoke)
      .queryExecution.executedPlan.toString

  test("q03: all three predicates and the projection reach the parquet scan") {
    val p = plan("q03_filter_project")
    // PushedFilters list is truncated in toString; EqualTo printing proves
    // pushdown reached the scan, the Filter line shows all three predicates
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.contains("l_quantity#") && p.contains(">= 45.0"), p)
    // pruned read schema: no untouched columns materialize
    assert(!p.contains("l_tax") && !p.contains("l_suppkey"), p)
  }

  test("q04 flagship: broadcast joins + TakeOrderedAndProject, single agg exchange") {
    val p = plan("q04_top5_customers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p) // no big-big sort at this shape
  }

  test("q13 top-k never global-sorts") {
    val p = plan("q13_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q17: dimension is broadcast, fact side never shuffles before the agg") {
    val p = plan("q17_case_recode_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q01: partial+final hash aggregation (map-side combine before the exchange)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_"), p) // partial aggregate functions present
    assert(p.contains("HashAggregate"), p)
  }
}
