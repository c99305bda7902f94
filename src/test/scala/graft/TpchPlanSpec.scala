package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions for the TPC-H-shaped heads: the optimizations
  * each query's Scaladoc claims (pushed scans, semi/outer join types,
  * broadcast dimensions) must actually appear in the physical plan —
  * a regression here silently turns a 100 TB-safe plan into a slow one
  * long before any bench notices at sf0.1.
  */
class TpchPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q6: every predicate reaches the parquet scan as a pushed filter") {
    val p = plan("tpch_q6_forecast_revenue")
    assert(p.contains("PushedFilters:"), "no pushdown section in scan")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters:")).mkString
    assert(pushed.contains("l_shipdate") && pushed.contains("l_quantity"),
      s"shipdate/quantity not pushed: $pushed")
    assert(!p.contains("Join"), "Q6 must be join-free")
  }

  test("q4: the EXISTS gate plans as a left-semi join, not inner+distinct") {
    val p = plan("tpch_q4_order_priority")
    assert(p.contains("LeftSemi"), s"no LeftSemi in:\n${p.take(800)}")
  }

  test("q13: zero-order customers survive via a left-outer join") {
    val p = plan("tpch_q13_order_distribution")
    assert(p.contains("LeftOuter"), s"no LeftOuter in:\n${p.take(800)}")
  }

  test("q5/q10/q14/q19: dimension sides broadcast") {
    Seq("tpch_q5_local_supplier_volume", "tpch_q10_returned_items",
        "tpch_q14_promo_revenue", "tpch_q19_discounted_revenue").foreach { q =>
      assert(plan(q).contains("BroadcastHashJoin"), s"$q lost its broadcast join")
    }
  }

  test("q2/q9: the selective part gate broadcasts into the fact scan") {
    Seq("tpch_q2_min_cost_supplier", "tpch_q9_product_type_profit").foreach { q =>
      assert(plan(q).contains("BroadcastHashJoin"), s"$q lost its broadcast join")
    }
  }

  test("q20: the nested-EXISTS chain plans as a left-semi join") {
    val p = plan("tpch_q20_excess_suppliers")
    assert(p.contains("LeftSemi"), s"no LeftSemi in:\n${p.take(800)}")
  }

  test("q21: blame assignment runs on the collapsed (order, supplier) grain") {
    // two cascaded HashAggregates must both sit below the final join —
    // a plan that joins raw lineitem rows against lineitem would explode
    // at scale; the collapse to (orderkey, suppkey) happens first
    val p = plan("tpch_q21_waiting_suppliers")
    val aggCount = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggCount >= 4, s"expected >=4 HashAggregate stages (2 grains x partial/final), got $aggCount")
    assert(!p.contains("CartesianProduct"))
  }

  test("bitmap distinct: bit_or combines map-side (two-stage aggregate)") {
    val p = plan("agg_bitmap_distinct")
    assert(p.contains("partial_bit_or") || p.contains("partial bit_or") ||
      (p.contains("bit_or") && p.contains("HashAggregate")),
      s"no partial bit_or aggregate in:\n${p.take(800)}")
  }

  test("weighted median: the window runs over the collapsed price grain") {
    // the plan must aggregate (distinct price grain) BEFORE any Window
    val qe = SparkEntry.queries("agg_weighted_median")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val aggIdx = qe.indexOf("HashAggregate")
    val winIdx = qe.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0)
    // physical plans print top-down: the Window consumes the aggregate,
    // so the aggregate must appear BELOW (after) the window operator
    assert(winIdx < qe.lastIndexOf("HashAggregate"),
      "no aggregate below the window - fact rows would hit the sort")
  }
}
