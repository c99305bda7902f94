package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private val BucketKey = "spark.graft.rangeJoinRewrite.bucket"

  /** Flatten a physical plan including the trees AQE hides behind
    * leaf-like wrapper nodes — a plain `plan.collect` stops at
    * AdaptiveSparkPlanExec/QueryStageExec boundaries and sees none of
    * the joins.
    */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case q: QueryStageExec => nodes(q.plan)
    case r: ReusedExchangeExec => nodes(r.child)
    case other => other.children.flatMap(nodes)
  })

  private def equiJoinKeys(p: SparkPlan): Seq[Seq[org.apache.spark.sql.catalyst.expressions.Expression]] =
    nodes(p).collect {
      case j: ShuffledHashJoinExec => j.leftKeys ++ j.rightKeys
      case j: SortMergeJoinExec => j.leftKeys ++ j.rightKeys
      case j: BroadcastHashJoinExec => j.leftKeys ++ j.rightKeys
    }

  /** The MAIN branch is a real equi-join keyed on the bucket column
    * (not a nested loop), and every nested loop in the plan is a guard
    * fallback — its OWN condition references a marker column. A plan-
    * string `contains` check is vacuous here: the fallback's markers
    * are always SOMEWHERE in the string once the rewrite fires.
    */
  private def assertBucketedShape(p: SparkPlan): Unit = {
    nodes(p).collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { b =>
      assert(b.condition.exists(_.references.exists(
          _.name.startsWith("__graft_rb_m"))),
        s"nested loop whose condition carries no guard marker:\n$b")
    }
    assert(!nodes(p).exists(_.isInstanceOf[CartesianProductExec]),
      s"cartesian survived:\n$p")
    assert(equiJoinKeys(p).exists(_.exists(_.references.exists(
        _.name.startsWith("__graft_rb")))),
      s"no hash/sort-merge join keyed on the bucket:\n$p")
  }

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
    val exec = naive.queryExecution.executedPlan
    assertBucketedShape(exec)
    assert(exec.toString.contains("Generate explode"),
      "interval bucket explode missing")
    // the key equality must be a JOIN key, not a post-join filter: the
    // main equi-join's key list carries both the bucket AND a non-graft
    // key (k/k2)
    assert(equiJoinKeys(exec).exists { keys =>
      keys.exists(_.references.exists(_.name.startsWith("__graft_rb"))) &&
        keys.exists(_.references.exists(a => !a.name.startsWith("__graft_rb")))
    }, s"key equality not kept next to the bucket key:\n$exec")
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

  test("rewrite survives downstream actions' fresh QueryExecutions (bench/verify shapes)") {
    // Bench executes fn(...).count() and Verify fn(...).coalesce(1)
    // .write — BOTH build a NEW QueryExecution over the logical plan
    // and re-run the optimizer AFTER withRangeBucket restored the conf.
    // Round 9 shipped with the rewrite only in the memoized (never
    // executed) QueryExecution; this pins the fix: withRangeBucket
    // rebases the Dataset on the optimized plan, so a downstream
    // action's plan still carries the bucketed join.
    spark.conf.unset(BucketKey)
    try {
      val sfDir = "/root/testdata/sf0.001"
      for (q <- Seq("join_range_auto", "join_overlap_auto", "join_band_auto",
          "join_asof_auto")) {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        // count() shape: Aggregate over the returned plan, fresh QE
        val countShaped = df.groupBy().count()
        assert(equiJoinKeys(countShaped.queryExecution.executedPlan).exists(
            _.exists(_.references.exists(_.name.startsWith("__graft_rb")))),
          s"$q: rewrite lost on the count() execution path")
        // write shape: Repartition over the returned plan, fresh QE
        val writeShaped = df.coalesce(1)
        assert(equiJoinKeys(writeShaped.queryExecution.executedPlan).exists(
            _.exists(_.references.exists(_.name.startsWith("__graft_rb")))),
          s"$q: rewrite lost on the coalesce/write execution path")
      }
    } finally spark.conf.set(BucketKey, "900")
  }

  test("NaN interval bounds on double axes route to the fallback, matches kept") {
    // Spark orders NaN largest, so the theta join DOES match
    // hi = NaN intervals (p <= NaN is true for every p) — but
    // cast(floor(NaN/w) as long) buckets to 0, so the bucketed branch
    // would pair the interval only with bucket-0 points and silently
    // drop the rest. NaN bounds must take the exact fallback branch.
    spark.conf.set(BucketKey, "100")
    try {
      val ptsD = Seq((1L, 50.0), (1L, 5000.0)).toDF("k", "p")
      val ivsD = Seq((1L, 7L, 5.0, Double.NaN), (1L, 8L, 40.0, 60.0))
        .toDF("k2", "iv_id", "lo", "hi")
      def q = ptsD.join(ivsD, col("k") === col("k2") &&
        col("p") >= col("lo") && col("p") <= col("hi"))
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_rb_p"),
        "rewrite did not fire on the double axis")
      val got = q.collect().toSet
      assert(got == brute(q))
      // the NaN-bounded interval matched the far point (bucket 50) —
      // only reachable through the fallback theta branch
      assert(got.exists(r => r.getLong(3) == 7L && r.getDouble(1) == 5000.0),
        "NaN-hi interval lost its far-bucket match")

      // overlap path: a_hi = NaN overlaps every b interval with
      // b_lo <= NaN (all of them) per theta semantics
      def q2 = Seq((0L, 5.0, Double.NaN)).toDF("a_id", "a_lo", "a_hi")
        .join(Seq((0L, 900.0, 1000.0)).toDF("b_id", "b_lo", "b_hi"),
          col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      assert(q2.collect().toSet == brute(q2))
      assert(q2.count() == 1, "NaN-hi interval lost its overlap match")
    } finally spark.conf.set(BucketKey, "900")
  }

  test("property fuzz: random intervals with NULL/malformed/straddling bounds stay exact") {
    // adversarial inputs for the guard's partition argument: NULL
    // bounds (match nothing), lo > hi rows (overlap theta CAN match),
    // spans straddling exactly maxFanout buckets (boundary of the
    // good/wide split), points on bucket edges. Rewritten == naive,
    // row for row, across seeded trials.
    spark.conf.set(BucketKey, "100")
    spark.conf.set("spark.graft.rangeJoinRewrite.maxFanout", "4")
    try {
      val gen = new scala.util.Random(20260815L)
      for (trial <- 1 to 6) {
        def mkIv(n: Int, tag: String) = {
          val rows = (0 until n).map { i =>
            val lo = gen.nextInt(2000).toLong
            val span = gen.nextInt(8) match {
              case 0 => 400L // exactly maxFanout(4) * width(100): wide edge
              case 1 => 399L // one under the edge
              case 2 => -gen.nextInt(300).toLong - 1 // malformed lo > hi
              case k => (k * 60).toLong
            }
            val loOpt = if (gen.nextInt(12) == 0) None else Some(lo)
            val hiOpt = if (gen.nextInt(12) == 0) None else Some(lo + span)
            (i.toLong, loOpt, hiOpt)
          }
          rows.toDF(s"${tag}_id", s"${tag}_lo", s"${tag}_hi")
        }
        val a = mkIv(80, "a")
        val b = mkIv(70, "b")
        def overlap = a.join(b,
          col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        assert(overlap.collect().toSet == brute(overlap),
          s"overlap mismatch on trial $trial")
        val p = (0 until 120).map(_ =>
          (0L, (gen.nextInt(25) * 100 - 200).toLong)).toDF("junk", "p")
        def pin = p.join(b,
          col("p") >= col("b_lo") && col("p") <= col("b_hi"))
        assert(pin.collect().toSet == brute(pin),
          s"point-in-interval mismatch on trial $trial")
      }
    } finally {
      spark.conf.set(BucketKey, "900")
      spark.conf.unset("spark.graft.rangeJoinRewrite.maxFanout")
    }
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
