package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vals = (1L to 5000L).map(i => ((i * 7919) % 100003, i))
    .toDF("v", "k")

  test("exactQuantile equals the single-window reference at several q") {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("k"))
    val ranked = vals
      .withColumn("r0", row_number().over(w).cast("long") - 1)
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val expect = ranked
        .filter(col("r0") === floor(lit(q) * (col("n") - 1).cast("double")).cast("long"))
        .select("v", "k").collect().map(r => (r.getLong(0), r.getLong(1))).head
      val got = Quantiles.exactQuantile(vals, "v", "k", q, bucketWidth = 1000L)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === 1, s"q=$q must select exactly one row")
      assert(got.head === expect, s"q=$q")
    }
  }

  test("exactQuantile is partitioning-independent and handles ties") {
    val tied = (1L to 2000L).map(i => (i % 5, i)).toDF("v", "k")
    val a = Quantiles.exactQuantile(tied, "v", "k", 0.5, bucketWidth = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val b = Quantiles.exactQuantile(tied.repartition(17), "v", "k", 0.5,
        bucketWidth = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(a === b)
    // median of 2000 rows over values 0..4 (uniform): index 999 -> value 2
    assert(a._1 === 2L)
  }

  test("weightedMedianByGroup equals the single-window weighted reference") {
    // deterministic pseudo-random (group, value, weight) rows with
    // duplicate values (the grain-collapse path) and skewed weights
    val rows = (1L to 5000L).map { i =>
      (s"g${i % 4}", (i * 2654435761L % 9973L), 1L + (i * 40503L % 97L))
    }.toDF("g", "v", "w")
    val naive = {
      val byG = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      val cum = byG.orderBy(col("v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      rows.groupBy(col("g"), col("v")).agg(sum(col("w")).as("w"))
        .withColumn("cum", sum(col("w")).over(cum))
        .withColumn("tot", sum(col("w")).over(byG))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy(col("g")).agg(min(col("v")).as("v"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    for (width <- Seq(1L, 7L, 100L, 100000L)) {
      val got = Quantiles.weightedMedianByGroup(rows, "g", "v", "w", width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == naive, s"bucketWidth=$width")
    }
    // width larger than the whole domain degenerates to one bucket and
    // must still agree (the in-bucket scan carries everything)
    val one = Quantiles.weightedMedianByGroup(rows.repartition(13), "g", "v", "w",
        1000000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == naive)
  }

  test("exactQuantileByGroupBucketed equals the partitioned-window form") {
    // duplicate values, uneven group sizes, and several bucket widths —
    // including one bucket per value and one bucket for everything
    val rows = (1L to 6000L).map { i =>
      (s"g${i % 7}", (i * 2654435761L) % 4999L, i)
    }.toDF("g", "v", "k")
    for (q <- Seq(0.0, 0.5, 0.9); width <- Seq(1L, 50L, 1000000L)) {
      val expect = Quantiles.exactQuantileByGroup(rows, "g", "v", "k", q)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = Quantiles.exactQuantileByGroupBucketed(
          rows.repartition(11), "g", "v", "k", q, width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect, s"q=$q width=$width")
      // exactly one row per group, and n is the group size
      val ns = Quantiles.exactQuantileByGroupBucketed(rows, "g", "v", "k", q, width)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(ns.values.sum == 6000L, s"q=$q width=$width group sizes wrong")
    }
  }
}
