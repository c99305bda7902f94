package graft.suite

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** agg_sliding_distinct computes exact trailing-7-day distinct users via
  * the bounded calendar fan-out + (user, window) dedup; this pins it
  * against the brute-force form (one count-distinct per window position
  * over the raw grain) — the plan shape differs completely, the rows
  * must not.
  */
class SlidingDistinctSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("fan-out form equals brute-force per-window count distinct") {
    val got = graft.SparkEntry.queries("agg_sliding_distinct")(spark, sfDir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    val ud = Registry.tbl(spark, sfDir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct
    val maxD = days.max((a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b))
    val brute = days.flatMap(d => (0 to 6).map(i => d.plusDays(i)))
      .distinct.filter(!_.isAfter(maxD)).map { wend =>
        val lo = wend.minusDays(6)
        wend.toString -> ud.collect {
          case (u, d) if !d.isBefore(lo) && !d.isAfter(wend) => u
        }.distinct.size.toLong
      }.toMap
    assert(got == brute)
  }
}
