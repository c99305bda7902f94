package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  // deterministic points and intervals sharing a handful of keys
  private def pts(n: Int) =
    (0 until n).map { i =>
      (i.toLong % 7, (i.toLong * 2654435761L) % 100000L)
    }.toDF("k", "p")

  private def ivs(n: Int) =
    (0 until n).map { i =>
      val lo = (i.toLong * 40503L) % 100000L
      (i.toLong % 7, i.toLong, lo, lo + 500L + (i % 11) * 300L)
    }.toDF("k2", "iv_id", "lo", "hi")

  private def naive = pts(400).join(ivs(120),
    col("k") === col("k2") && col("p") >= col("lo") && col("p") <= col("hi"))

  test("range-join rewrite: bucketed equi-join with the key kept, no nested loop") {
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop survived:\n$plan")
    assert(plan.contains("Generate explode"), "interval bucket explode missing")
    // the key equality must be a JOIN key, not a post-join filter:
    // the hash join's key list mentions both k and the bucket
    assert(plan.contains("__graft_rb_p"), "bucket key missing from plan")
  }

  test("range-join rewrite: result identical to the brute-force theta join") {
    spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "false")
    val brute =
      try naive.collect().toSet
      finally spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "true")
    val got = naive.collect().toSet
    assert(got.nonEmpty, "degenerate fixture: no points in any interval")
    assert(got == brute)
  }

  test("strict and mixed bound orientations rewrite and agree") {
    // lo < p AND hi >= p (reversed operand order, strict lower bound)
    def q = pts(300).join(ivs(90),
      col("k") === col("k2") && col("lo") < col("p") && col("hi") >= col("p"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop survived:\n$plan")
    spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "false")
    val brute =
      try q.collect().toSet
      finally spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "true")
    assert(q.collect().toSet == brute)
  }

  test("degenerate hi < lo intervals match nothing") {
    val bad = Seq((1L, 0L, 900L, 100L)).toDF("k2", "iv_id", "lo", "hi")
    val got = pts(50).join(bad,
      col("k") === col("k2") && col("p") >= col("lo") && col("p") <= col("hi"))
    assert(got.count() == 0)
  }

  test("one-sided bounds and unset bin size are left untouched") {
    // only a lower bound: no pair, no rewrite
    val oneSided = pts(50).join(ivs(20),
      col("k") === col("k2") && col("p") >= col("lo"))
    val p1 = oneSided.queryExecution.executedPlan.toString
    assert(!p1.contains("__graft_rb_p"), "rewrite fired on a one-sided bound")
    // bin size unset: rule inactive even on a full pair
    val saved = spark.conf.get("spark.graft.rangeJoinRewrite.bucket")
    spark.conf.set("spark.graft.rangeJoinRewrite.bucket", "")
    try {
      val p2 = naive.queryExecution.executedPlan.toString
      assert(!p2.contains("__graft_rb_p"), "rewrite fired without a bin size")
    } finally spark.conf.set("spark.graft.rangeJoinRewrite.bucket", saved)
  }
}
