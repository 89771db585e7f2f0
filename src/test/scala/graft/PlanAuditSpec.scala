package graft

/** Physical-plan regression guard: the 100 TB plan shapes PLANS.md audits
  * by hand, pinned as assertions. Plans are built (not fully executed) at
  * sf0.001 — construction still runs the eager stats probes some queries
  * need (rank boundaries), which is fine at this SF. */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("s9: the time-range predicate reaches the parquet scan") {
    val p = plan("s9_time_range_scan")
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(2000))
  }

  test("q5: dimension joins broadcast (no shuffle on the fact side)") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q3: top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("q3_top_orders").contains("TakeOrderedAndProject"))
  }

  test("no query plans a cartesian product") {
    // crossJoin of scalar aggs is BroadcastNestedLoopJoin over 1 row —
    // fine; an unconstrained CartesianProduct over data frames is never
    // acceptable and this pins it engine-wide
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      assert(!plan(name).contains("CartesianProduct"), s"query $name")
    }
  }
}
