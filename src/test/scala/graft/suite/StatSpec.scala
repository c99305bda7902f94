package graft.suite

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the sketch/stat operators in [[StatQueries]]: the
  * Misra–Gries candidate guarantee, KMV accuracy and mergeability, and
  * OLS exactness on a known line.
  */
class StatSpec extends SparkSpec {

  test("Misra–Gries summary certifies every item above n/phi, bounded size") {
    val phi = 10
    // skewed stream: item 1 × 500, item 2 × 120, 100 singletons
    val stream = scala.util.Random.shuffle(
      (Seq.fill(500)(1L) ++ Seq.fill(120)(2L) ++ (100L until 200L)).toList)
    val out = StatQueries.misraGries(stream.iterator, phi).toSet
    assert(out.size <= phi, "summary must hold at most phi counters")
    val n = stream.size
    val heavy = stream.groupBy(identity).collect {
      case (k, v) if v.size > n / phi => k
    }.toSet
    assert(heavy.subsetOf(out),
      s"items above n/phi must survive: heavy=$heavy missing=${heavy -- out}")
  }

  test("Misra–Gries union across splits still covers global heavy hitters") {
    val phi = 10
    val stream = (Seq.fill(300)(7L) ++ (0L until 400L)).toList
    // any partitioning of the stream: union of per-part summaries covers
    // items with global freq > N/phi (here 7 with 300 > 700/10)
    val parts = stream.grouped(97).toList
    val union = parts.flatMap(p => StatQueries.misraGries(p.iterator, phi)).toSet
    assert(union.contains(7L))
  }

  test("KMV estimate lands within 10% of true distinct on lineitem keys") {
    val row = StatQueries.all.find(_.name == "agg_kmv_distinct").get
      .fn(spark, "/root/testdata/sf0.001").collect().head
    val est = row.getAs[Double]("est_distinct")
    val truth = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(countDistinct(col("l_orderkey"))).collect().head.getLong(0)
    assert(math.abs(est - truth) / truth < 0.10,
      s"KMV est=$est truth=$truth")
  }

  test("heavy hitters output is exact and certified") {
    val df = StatQueries.all.find(_.name == "agg_heavy_hitters").get
      .fn(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // exact recount: compare against the plain groupBy on the same data
    val words = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("word"))
      .select(graft.dedup.Dedup.wordId(col("word")).as("word_id"))
    val n = words.count()
    val expect = words.groupBy("word_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > lit(n.toDouble / StatQueries.Phi))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
  }

  test("globalCumMax equals the single-partition running max") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i * 37) % 1009, ((i * 73) % 200 - 100).toLong))
      .distinctBy(_._1).toDF("k", "v")
    val got = graft.operators.Windows.globalCumMax(df, "k", "v")
      .orderBy("k").collect().map(r => (r.getAs[Int]("k"), r.getAs[Long]("cummax_v")))
    val rows = df.orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1)))
    var m = Long.MinValue
    val want = rows.map { case (k, v) => m = math.max(m, v); (k, m) }
    assert(got.toSeq == want.toSeq)
  }

  test("max drawdown matches the naive sequential scan") {
    val row = StatQueries.all.find(_.name == "agg_max_drawdown").get
      .fn(spark, "/root/testdata/sf0.001").collect().head
    val series = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .groupBy(unix_timestamp(col("ts")).as("sec"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .orderBy("sec").collect().map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L; var high = Long.MinValue; var best = Long.MinValue; var at = 0L
    series.foreach { case (sec, c) =>
      cum += c; high = math.max(high, cum)
      if (high - cum > best) { best = high - cum; at = sec }
    }
    assert(row.getAs[Long]("max_drawdown_cents") == best)
    assert(row.getAs[Long]("at_sec") == at)
  }

  test("OLS recovers an exact line with r2 = 1") {
    import spark.implicits._
    // y = 3x + 50 exactly, in cents already (slope invariant to scaling)
    val df = (1 to 100).map(i => ("g", i.toDouble, (3 * i + 50).toDouble / 1.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val out = java.nio.file.Files.createTempDirectory("olsspec").toString
    df.write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    val r = StatQueries.all.find(_.name == "agg_ols_by_group").get
      .fn(spark, out).collect().head
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("intercept_cents") - 5000.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-12)
  }
}
