package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private val BucketKey = "spark.graft.rangeJoinRewrite.bucket"

  // the bin is scoped per suite run, mirroring Registry.withRangeBucket's
  // scoped-conf contract (no session-wide bin anywhere)
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(BucketKey, "900")
  }

  override def afterAll(): Unit = {
    spark.conf.unset(BucketKey)
    super.afterAll()
  }

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

  private def brute[T](df: => org.apache.spark.sql.DataFrame) = {
    spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "false")
    try df.collect().toSet
    finally spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "true")
  }

  test("range-join rewrite: bucketed equi-join with the key kept, no nested loop") {
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoinExec") ||
      plan.contains("__graft_rb_m"),
      s"nested loop without a guard marker survived:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian survived:\n$plan")
    assert(plan.contains("Generate explode"), "interval bucket explode missing")
    // the key equality must be a JOIN key, not a post-join filter:
    // the hash join's key list mentions both k and the bucket
    assert(plan.contains("__graft_rb_p"), "bucket key missing from plan")
  }

  test("range-join rewrite: result identical to the brute-force theta join") {
    val want = brute(naive)
    val got = naive.collect().toSet
    assert(got.nonEmpty, "degenerate fixture: no points in any interval")
    assert(got == want)
  }

  test("strict and mixed bound orientations rewrite and agree") {
    // lo < p AND hi >= p (reversed operand order, strict lower bound)
    def q = pts(300).join(ivs(90),
      col("k") === col("k2") && col("lo") < col("p") && col("hi") >= col("p"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_rb_p"), "rewrite did not fire")
    assert(q.collect().toSet == brute(q))
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
    spark.conf.set(BucketKey, "")
    try {
      val p2 = naive.queryExecution.executedPlan.toString
      assert(!p2.contains("__graft_rb_p"), "rewrite fired without a bin size")
    } finally spark.conf.set(BucketKey, "900")
  }

  test("fan-out guard: over-wide intervals take the fallback branch, results exact") {
    // 3 intervals wider than maxFanout*width (4 buckets * 100) mixed
    // with narrow ones; the wide rows must still match — via the
    // marker-tagged theta branch, not a 10^6-bucket explode
    spark.conf.set(BucketKey, "100")
    spark.conf.set("spark.graft.rangeJoinRewrite.maxFanout", "4")
    try {
      def q = pts(200).join(
        Seq((0L, 900L, 0L, 99999L), (1L, 901L, 10L, 80000L),
          (2L, 902L, 5L, 70001L), (0L, 1L, 100L, 700L), (1L, 2L, 50L, 260L))
          .toDF("k2", "iv_id", "lo", "hi"),
        col("k") === col("k2") && col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_rb_p"), "bucketed branch missing")
      assert(plan.contains("__graft_rb_m"), "fallback guard branch missing")
      val got = q.collect().toSet
      val want = brute(q)
      assert(got == want)
      // wide intervals really matched through the fallback (iv_id is
      // column 3 of the joined row: k, p, k2, iv_id, lo, hi)
      assert(got.exists(_.getLong(3) >= 900L), "wide interval lost its matches")
    } finally {
      spark.conf.set(BucketKey, "900")
      spark.conf.unset("spark.graft.rangeJoinRewrite.maxFanout")
    }
  }

  private def ivsA(n: Int) =
    (0 until n).map { i =>
      val lo = (i.toLong * 40503L) % 100000L
      (i.toLong, lo, lo + 200L + (i % 13) * 150L)
    }.toDF("a_id", "a_lo", "a_hi")

  private def ivsB(n: Int) =
    (0 until n).map { i =>
      val lo = (i.toLong * 69069L) % 100000L
      (i.toLong, lo, lo + 100L + (i % 7) * 400L)
    }.toDF("b_id", "b_lo", "b_hi")

  test("overlap rewrite: naive aLo<=bHi AND bLo<=aHi plans bucketed, exact") {
    def q = ivsA(250).join(ivsB(200),
      col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_rb_p") && plan.contains("__graft_rb_i"),
      s"overlap rewrite did not fire:\n$plan")
    val got = q.collect().toSet
    val want = brute(q)
    assert(got.nonEmpty && got == want)
  }

  test("overlap rewrite: exactly-once (no duplicate pairs from shared buckets)") {
    def q = ivsA(250).join(ivsB(200),
      col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .groupBy("a_id", "b_id").count().filter(col("count") > 1)
    assert(q.count() == 0, "a pair was emitted more than once")
  }

  test("overlap rewrite: malformed lo>hi intervals keep their theta-join matches") {
    // the theta join CAN match a malformed interval (a=[10,5] vs
    // b=[0,20]); the rewrite must route it through the fallback, not
    // drop it
    def q = Seq((0L, 10L, 5L), (1L, 30L, 40L)).toDF("a_id", "a_lo", "a_hi")
      .join(Seq((0L, 0L, 20L)).toDF("b_id", "b_lo", "b_hi"),
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
    val got = q.collect().toSet
    assert(got == brute(q))
    assert(got.exists(_.getLong(0) == 0L), "malformed interval match dropped")
  }

  test("overlap rewrite prefers the non-strict bound pair over a key-order conjunct") {
    // self-join dedup pattern: a.id < b.id rides next to the real
    // bounds; the strict key comparison must NOT be picked as the axis
    def q = ivsA(150).join(
      ivsB(150).withColumnRenamed("b_id", "b_id2"),
      col("a_id") < col("b_id2") &&
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_rb_p"), "overlap rewrite did not fire")
    // wrong-axis pick would route EVERYTHING through the id..epoch
    // fallback; the right pick keeps the bucketed branch populated —
    // check results and that the explode is present
    assert(plan.contains("Generate explode"), "bucket explode missing")
    assert(q.collect().toSet == brute(q))
  }

  test("registered queries get the rewrite via Registry.withRangeBucket, no session conf") {
    // the scoped-conf contract: the bin is set only around plan
    // construction (optimizedPlan forced + memoized under it), so the
    // registered query rewrites even when the session carries no bin —
    // and the session conf is restored afterwards
    spark.conf.unset(BucketKey)
    try {
      val sfDir = "/root/testdata/sf0.001"
      val auto = graft.SparkEntry.queries("join_range_auto")(spark, sfDir)
      assert(spark.conf.getOption(BucketKey).isEmpty,
        "withRangeBucket leaked the bin conf into the session")
      assert(auto.queryExecution.optimizedPlan.toString.contains("__graft_rb_p"),
        "join_range_auto was not rewritten under the scoped conf")
      val ovl = graft.SparkEntry.queries("join_overlap_auto")(spark, sfDir)
      assert(ovl.queryExecution.optimizedPlan.toString.contains("__graft_rb_p"),
        "join_overlap_auto was not rewritten under the scoped conf")
      // the band join is the overlap matcher's degenerate-interval case
      // ([sec, sec+300] both sides) — it must bucket, not nested-loop
      val band = graft.SparkEntry.queries("join_band_auto")(spark, sfDir)
      assert(band.queryExecution.optimizedPlan.toString.contains("__graft_rb_p"),
        "join_band_auto was not rewritten under the scoped conf")
    } finally spark.conf.set(BucketKey, "900")
  }

  test("rewrite scope: outer joins and user-hinted joins are left untouched") {
    // outer join semantics differ (unmatched rows must survive) — the
    // rewrite only claims Inner/Cross
    val outer = pts(60).join(ivs(20),
      col("k") === col("k2") && col("p") >= col("lo") && col("p") <= col("hi"),
      "left")
    assert(!outer.queryExecution.optimizedPlan.toString.contains("__graft_rb"),
      "rewrite fired on an outer join")
    // an explicit join-strategy hint is the user picking the plan —
    // honor it rather than restructuring around it
    val hinted = pts(60).join(ivs(20).hint("broadcast"),
      col("k") === col("k2") && col("p") >= col("lo") && col("p") <= col("hi"))
    assert(!hinted.queryExecution.optimizedPlan.toString.contains("__graft_rb"),
      "rewrite fired on a hinted join")
    // and both still return the right rows
    assert(outer.count() >= pts(60).count())
    assert(hinted.collect().toSet == brute(hinted))
  }

  test("strictly-matching results with the hand-written intervalOverlap operator") {
    val a = ivsA(220)
    val b = ivsB(180)
    def auto = a.join(b,
      col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id")
    val op = graft.operators.RangeJoin.intervalOverlap(
      a.withColumnRenamed("a_lo", "lo").withColumnRenamed("a_hi", "hi"),
      "lo", "hi",
      b.withColumnRenamed("b_lo", "lo").withColumnRenamed("b_hi", "hi"),
      "lo", "hi", Nil, bucketWidth = 900L)
      .select("a_id", "b_id")
    assert(auto.collect().toSet == op.collect().toSet)
  }
}
