package graft

/** Physical-plan assertions for the second TPC-H batch (operators/Tpch.scala).
  * Correctness is oracle-gated; these pin the plan SHAPES that matter at
  * 100 TB — semi/anti decorrelation instead of row-duplicating joins,
  * dim broadcasts, and the disjunctive-envelope pushdown of Q19.
  */
class TpchPlanSpec extends SparkSuite {

  private def planString(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q4: EXISTS is a left-semi join; order-date range reaches the scan") {
    val p = planString("q4_priority_late")
    assert(p.contains("LeftSemi"), p.take(2000))
    // the quarter filter must prune the orders scan, not run post-join
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"),
      p.take(2000))
    // one order out per match regardless of late-line count: no inner join
    assert(!p.contains("Inner"), "semi decorrelation must not duplicate rows")
  }

  test("q9: every dimension broadcasts; the name filter prunes the part dim") {
    val p = planString("q9_product_profit")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(3000))
    assert(p.contains("StringContains") || p.contains("Contains"),
      "LIKE '%red%' should reach the part scan as a contains pushdown")
  }

  test("q19: the cross-arm quantity envelope prunes the fact scan") {
    val p = planString("q19_bracket_revenue")
    // the OR is disjunctive, but quantity BETWEEN 1 AND 30 holds across all
    // arms — it must appear in the lineitem PushedFilters
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(p).mkString("\n")
    assert(pushed.contains("l_quantity"), pushed)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q21: both EXISTS arms are equi semi/anti joins, never a cross product") {
    val p = planString("q21_waiting_supplier")
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "suppkey inequality must ride as a residual on the orderkey equi join")
  }

  test("q2: dim filters prune the fact scan as semi-joins below the cost agg") {
    val p = planString("q2_min_cost_supplier")
    // both the part selection and the EUROPE supplier set must reach the
    // lineitem side BEFORE the (part, supp) cost aggregate — as broadcast
    // left-semi joins — so the aggregate only sees qualifying lines
    assert("BroadcastHashJoin.*LeftSemi".r.findAllIn(p).size >= 2,
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q2: BOTH dim semi-joins sit BELOW the cost aggregate (tree-checked)") {
    // the string assertion above counts semi-joins anywhere; this pins
    // their POSITION — the comment at Tpch.scala's q2 claims the early
    // prune is what keeps the (part, supp) aggregate from grouping the
    // whole fact table, so the min(l_extendedprice) Aggregate's own
    // subtree must contain both LeftSemi joins. Checked on the optimized
    // logical plan (AQE re-plans the physical tree lazily).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val lp = SparkEntry.queries("q2_min_cost_supplier")(spark, sf)
      .queryExecution.optimizedPlan
    val costAggs = lp.collect {
      case a: Aggregate
          if a.aggregateExpressions.exists(
            _.toString.contains("l_extendedprice")) => a
    }
    assert(costAggs.nonEmpty, "no cost aggregate over l_extendedprice:\n" +
      lp.toString.take(3000))
    val semisBelow = costAggs.head.collect {
      case j: Join if j.joinType == LeftSemi => j
    }
    assert(semisBelow.size >= 2,
      s"expected 2 LeftSemi joins below the cost aggregate, found " +
        s"${semisBelow.size}:\n" + costAggs.head.toString.take(3000))
  }

  test("q17: the correlated threshold decorrelates to a broadcast per-part agg") {
    val p = planString("q17_small_qty_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }
}
