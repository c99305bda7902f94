package graft

import org.apache.spark.sql.functions._

/** Global scale-killer guard: every registered query's physical plan is
  * free of all-pairs join shapes — CartesianProduct anywhere, and
  * BroadcastNestedLoopJoin between unbounded sides — the operators that
  * turn a 100 TB run into an N^2 run.
  *
  * Two deliberate exceptions, each with a bounded side:
  * - `sim_cosine_topk` is the documented brute-force baseline the ANN
  *   queries are measured against (all-pairs by definition).
  * - A BroadcastNestedLoopJoin whose broadcast side is a BOUNDED
  *   dimension is the intended shape for unconditioned dimension
  *   attachment: the numCells-row k-means codebook in `sim_ivf_cells` /
  *   `sim_ivf_topk` / `sim_ivf_pq_topk` / `sim_ivf_prefix_rerank` /
  *   `sim_knn_classify` (the compositions inherit the
  *   shared IVF distance frame and with it the same bounded codebook
  *   join). Cost is O(N x dim), not O(N^2). (1-row scalars no
  *   longer need even that: `ColumnBridge.scalar` attaches them as
  *   uncorrelated scalar subqueries — `text_tfidf_topk` migrated.)
  *
  * Planning only — queries are built and optimized at sf0.001, not
  * executed, though builder-side fixture setup (bucketed tables, corpus
  * artifacts) does run on first touch.
  */
class PlanShapeSpec extends SparkSpec {

  private val bruteForceBaseline = Set("sim_cosine_topk")
  private val boundedDimensionBnl =
    Set("sim_ivf_cells", "sim_ivf_topk", "sim_ivf_pq_topk",
      "sim_ivf_prefix_rerank", "sim_knn_classify")
  private val sfDir = "/root/testdata/sf0.001"

  test("no registered query plans an all-pairs join (except documented exceptions)") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      if (bruteForceBaseline(name)) None
      else {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnl = plan.contains("BroadcastNestedLoopJoin") && !boundedDimensionBnl(name)
        if (cart || bnl) Some(name) else None
      }
    }
    assert(offenders.isEmpty,
      s"all-pairs join shapes found in: ${offenders.mkString(", ")}")
    // and the baseline IS the brute-force shape it claims to be
    val baseline = SparkEntry.queries("sim_cosine_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(baseline.contains("BroadcastNestedLoopJoin") ||
      baseline.contains("CartesianProduct"))
  }
}
