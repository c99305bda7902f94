package graft.suite

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the round-5 closing analytics batch: skyline dominance
  * against the quadratic definition, retention-triangle structural
  * invariants, and the streak identity against a per-user scan.
  */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(n: String) = graft.SparkEntry.queries(n)(spark, dir)

  test("agg_pareto_frontier equals the quadratic NOT-EXISTS skyline") {
    val pts = spark.read.parquet(s"$dir/part.parquet")
      .select(round(col("p_retailprice") * 100).cast("long").as("p"),
        col("p_size").as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // quadratic definition over the (price -> best size) reduction:
    // keep a point iff no other point is <= on price AND >= on size
    // with at least one strict
    val best = pts.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).max) }.toSeq
    val expect = best.filter { case (p, s) =>
      !best.exists { case (p2, s2) =>
        (p2 <= p && s2 >= s) && (p2 < p || s2 > s)
      }
    }.sorted
    val got = q("agg_pareto_frontier").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    assert(got == expect)
  }

  test("agg_retention_cohorts structural invariants") {
    val rows = q("agg_retention_cohorts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohortSize = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    // every user appears in their own cohort on day 0, so offset-0
    // counts sum to the distinct-user total
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(cohortSize.values.sum == nUsers)
    // no (cohort, offset) cell can exceed its cohort's day-0 size,
    // and offsets are non-negative
    rows.foreach { case (c, off, n) =>
      assert(off >= 0L)
      assert(n <= cohortSize(c), s"cell ($c, $off) exceeds cohort size")
    }
  }

  test("win_streak_topk equals a per-user longest-run scan") {
    val days = Registry.tbl(spark, dir, "events")
      .select(col("user_id"),
        unix_timestamp(date_trunc("day", col("ts"))).as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1) / 86400L))
    val expect = days.groupBy(_._1).map { case (u, xs) =>
      val ds = xs.map(_._2).sorted
      // linear scan for the longest consecutive-day run
      var bestRun = 1L; var cur = 1L
      ds.sliding(2).filter(_.length == 2).foreach { w =>
        cur = if (w(1) == w(0) + 1) cur + 1 else 1L
        bestRun = math.max(bestRun, cur)
      }
      u -> bestRun
    }
    val topExpect = expect.toSeq.sortBy { case (u, s) => (-s, u) }.take(20)
    val got = q("win_streak_topk").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == topExpect)
  }
}
