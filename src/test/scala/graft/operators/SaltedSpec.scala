package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-stage agg == direct agg on skewed data") {
    // 10k rows on one hot key + a long tail
    val rows = (1 to 10000).map(i => ("hot", i.toLong, i.toDouble)) ++
      (1 to 100).map(i => (s"k$i", i.toLong, i.toDouble))
    val df = rows.toDF("k", "id", "v")
    val salted = Salted.saltedSumCount(df, Seq("k"), col("v"), col("id"))
      .orderBy("k")
    val direct = df.groupBy("k")
      .agg(sum(col("v")).as("sum_val"), count(lit(1)).as("n"))
      .orderBy("k")
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("stage-1 spreads the hot key over multiple salt buckets") {
    val df = (1 to 1000).map(i => ("hot", i.toLong, 1.0)).toDF("k", "id", "v")
    val buckets = df.withColumn("__salt", pmod(hash(col("id")), lit(32)))
      .select("__salt").distinct().count()
    assert(buckets > 16) // hot key's rows hit most of the 32 buckets
  }
}
