package graft

import org.scalatest.funsuite.AnyFunSuite

/** The star-join plan contract: all three dimension joins broadcast, so
  * the fact side's only exchange is the final aggregation's. */
class StarJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q_region_revenue broadcasts every dim; one aggregation exchange only") {
    val plan = graft.queries.KpiQueries
      .regionRevenue(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts == 3, s"expected 3 broadcast joins, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "fact table must not shuffle for dim joins")
  }
}
