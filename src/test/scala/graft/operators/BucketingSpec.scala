package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans with zero Exchange") {
    val left = (1L to 1000L).map(i => (i, i % 13)).toDF("k", "a")
    val right = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "b")
    Bucketing.writeBucketed(left, "bspec_left", Seq("k"), 4)
    Bucketing.writeBucketed(right, "bspec_right", Seq("k"), 4)

    // the fixture tables are tiny enough to auto-broadcast, which would
    // bypass bucketing entirely; disable it to expose the sort-merge
    // path a fact-to-fact join would take at scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bspec_left")
        .join(spark.table("bspec_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedJoin equals the plain join exactly") {
    val fact = (1L to 5000L).map(i => (if (i % 10 == 0) 1L else i % 50, i))
      .toDF("k", "v") // key 1 is hot
    val dim = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "d")
    val salted = Salted.saltedJoin(fact, dim, Seq("k"), spreadCol = col("v"), buckets = 8)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
