package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized range join == brute-force containment join (seeded random)") {
    val rnd = new scala.util.Random(11)
    val points = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
      .toDF("p_id", "k", "v")
    val intervals = (1 to 60).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong, rnd.nextInt(5).toLong, lo, lo + 1 + rnd.nextInt(2000))
    }.toDF("iv_id", "k", "lo", "hi")

    val fast = RangeJoin.rangeJoin(points, "v", intervals, "lo", "hi",
        Seq("k"), bucketWidth = 512L)
      .select("p_id", "iv_id")
    val brute = points.join(intervals, Seq("k"))
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
      .select("p_id", "iv_id")

    assert(fast.count() === brute.count())
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
    // no accidental duplicate emission: every (point, interval) pair once
    assert(fast.distinct().count() === fast.count())
  }

  test("plan is a bucket equi-join, not a nested loop") {
    val points = Seq((1L, 1L, 5L)).toDF("p_id", "k", "v")
    val intervals = Seq((1L, 1L, 0L, 10L)).toDF("iv_id", "k", "lo", "hi")
    val plan = RangeJoin.rangeJoin(points, "v", intervals, "lo", "hi",
      Seq("k"), 100L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("negative values bucket correctly (floor, not truncate)") {
    val points = Seq((1L, -150L), (2L, -50L), (3L, 50L)).toDF("p_id", "v")
    val intervals = Seq((10L, -100L, 60L)).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.rangeJoin(points, "v", intervals, "lo", "hi", Nil, 100L)
      .select("p_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(2L, 3L))
  }

  test("intervalOverlap == brute-force overlap join, exactly once (seeded random)") {
    val rnd = new scala.util.Random(23)
    def mk(n: Int, tag: String) = (1 to n).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong, rnd.nextInt(3).toLong, lo, lo + rnd.nextInt(3000).toLong)
    }.toDF(s"${tag}_id", "k", s"${tag}_lo", s"${tag}_hi")
    val a = mk(80, "a")
    val b = mk(120, "b")

    val fast = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
        Seq("k"), bucketWidth = 700L)
      .select("a_id", "b_id")
    val brute = a.join(b, Seq("k"))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id")

    assert(fast.count() === brute.count())
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
    assert(fast.distinct().count() === fast.count())
  }

  test("intervalOverlap boundaries: touching intervals overlap, disjoint don't") {
    val a = Seq((1L, 0L, 100L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq(
      (1L, 100L, 200L),  // touches at 100 -> closed-interval overlap
      (2L, 101L, 200L),  // disjoint by 1
      (3L, 0L, 1000L),   // spans many buckets, contains a entirely
      (4L, 50L, 60L))    // nested inside a
      .toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
        Nil, bucketWidth = 64L)
      .select("b_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 3L, 4L))
  }
}
