package graft.suite

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the time-series / history batch: EWMA against a local
  * brute-force recomputation, LOCF against a per-user scan, SCD2
  * history structural invariants, and the robust-stat definitions.
  */
class TimeseriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(n: String) = graft.SparkEntry.queries(n)(spark, dir)

  test("win_ewma equals brute-force truncated EWMA per row") {
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = events.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(_._2).map(r => (r._2, r._3))
    }
    val expect = byUser.flatMap { case (_, rows) =>
      rows.indices.map { i =>
        val window = rows.slice(math.max(0, i - 7), i + 1).reverse
        val num = window.zipWithIndex.map { case ((_, c), d) =>
          c.toDouble * math.pow(0.5, d)
        }.sum
        val den = window.indices.map(d => math.pow(0.5, d)).sum
        rows(i)._1 -> (num / den, window.length.toLong)
      }
    }.toMap
    val got = q("win_ewma").collect()
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (eid, (v, n)) =>
      assert(n == expect(eid)._2, s"event $eid n_terms")
      assert(v == expect(eid)._1, s"event $eid: $v != ${expect(eid)._1}")
    }
  }

  test("win_forward_fill carries the last purchase amount, else null") {
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expect = events.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      var lastOpt: Option[Long] = None
      rows.sortBy(_._2).map { case (_, eid, et, c) =>
        if (et == "purchase") lastOpt = Some(c)
        eid -> lastOpt
      }
    }
    val got = q("win_forward_fill").collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(got == expect.toMap)
  }

  test("pipeline_scd2_history: versions chain, partition time, never repeat") {
    val rows = q("pipeline_scd2_history").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.get(3), Option(r.get(4))))
    rows.groupBy(_._1).foreach { case (ck, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"cust $ck versions")
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          // chaining: each version closes exactly where the next opens
          assert(prev._5.contains(next._4), s"cust $ck v${prev._2} chain")
          // run collapse: consecutive versions differ in priority
          assert(prev._3 != next._3, s"cust $ck v${prev._2} repeated priority")
        case _ => ()
      }
      assert(sorted.last._5.isEmpty, s"cust $ck open tail")
    }
  }

  test("agg_mad and agg_corr_exact satisfy their definitions' bounds") {
    val mad = q("agg_mad").collect()
    assert(mad.nonEmpty)
    mad.foreach { r => assert(r.getLong(2) >= 0L) }
    val corr = q("agg_corr_exact").collect()
    assert(corr.nonEmpty)
    corr.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $c")
    }
  }
}
