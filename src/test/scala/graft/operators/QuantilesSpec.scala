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
}
