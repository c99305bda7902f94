package graft.suite

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the hypothesis-test / sketch-algebra / drift operators:
  * CUSUM's closed form vs the textbook recurrence, the Count-Min
  * overestimate guarantee, KMV set-algebra accuracy vs exact set
  * arithmetic, chi-squared/Welch/Simpson/Zipf sanity, and curriculum
  * ordering invariants.
  */
class StatTestsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) =
    Registry.all.find(_.name == name).get.fn(spark, sf)

  test("CUSUM closed form equals the sequential recurrence per user") {
    // recompute S_t = max(0, S_{t-1} + x_t - k) sequentially from the
    // same (user, sec) grain and compare against the window closed form
    val K = 6000L
    // sf0.001's 1k events never accumulate past the alarm threshold;
    // sf0.01 trips a few hundred alarms, making the equality meaningful
    val sf01 = "/root/testdata/sf0.01"
    val perSec = spark.read.parquet(s"$sf01/events.parquet")
      .groupBy(col("user_id"), unix_timestamp(col("ts")).as("sec"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = perSec.toSeq.flatMap { case (u, rows) =>
      var s = 0L
      rows.sortBy(_._2).toSeq.map { case (_, sec, cents) =>
        s = math.max(0L, s + cents - K)
        ((u, sec), s)
      }
    }
    val got = Registry.all.find(_.name == "win_cusum_alarm").get
      .fn(spark, sf01).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val alarms = expected.filter(_._2 > 40000L)
    assert(alarms.nonEmpty, "fixture should trip at least one alarm")
    assert(got.keySet == alarms.map(_._1).toSet,
      "alarm set must match the sequential recurrence")
    alarms.foreach { case (k, v) =>
      assert(got(k) == v, s"CUSUM value mismatch at $k: got ${got(k)} want $v")
    }
  }

  test("Count-Min estimates never underestimate and are exact-min over rows") {
    val rows = q("agg_countmin_estimate").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("cm_est")
      assert(est >= exact,
        s"CM must overestimate: word ${r.getAs[Long]("word_id")} est=$est exact=$exact")
    }
  }

  test("KMV set algebra tracks exact Jaccard and union within sketch error") {
    val row = q("agg_kmv_set_ops").collect().head
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    def setOf(p: String) = orders.filter(col("o_orderpriority") === p)
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    val a = setOf("1-URGENT")
    val b = setOf("5-LOW")
    val trueJ = (a & b).size.toDouble / (a | b).size
    val trueU = (a | b).size.toDouble
    val k = row.getAs[Long]("k_used")
    // k=256 bottom-k sketch: RSE ~ 1/sqrt(k) ≈ 6%; allow 3σ
    assert(math.abs(row.getAs[Double]("jaccard_est") - trueJ) < 0.2,
      s"jaccard est=${row.getAs[Double]("jaccard_est")} true=$trueJ")
    assert(math.abs(row.getAs[Double]("union_est") - trueU) / trueU < 0.2,
      s"union est=${row.getAs[Double]("union_est")} true=$trueU k=$k")
  }

  test("chi-squared cells: margins consistent, contributions non-negative") {
    val rows = q("agg_chi2_independence").collect()
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.map(_.getAs[Long]("o")).sum == n)
    val expSum = rows.map(_.getAs[Double]("expected")).sum
    assert(math.abs(expSum - n) < 1e-6 * n,
      s"expected-counts sum $expSum != N $n")
    rows.foreach(r => assert(r.getAs[Double]("chi2_contrib") >= 0.0))
  }

  test("Welch t-test: df bounded by classic limits, moments consistent") {
    val rows = q("agg_welch_ttest").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n1 = r.getAs[Long]("n_weekday"); val n2 = r.getAs[Long]("n_weekend")
      val df = r.getAs[Double]("df_welch")
      assert(df >= math.min(n1, n2) - 1 - 1e-9 && df <= n1 + n2 - 2 + 1e-9,
        s"Welch df $df outside [min-1, n1+n2-2] for n1=$n1 n2=$n2")
      assert(!r.getAs[Double]("t_stat").isNaN)
    }
  }

  test("Simpson diversity lies in [0,1] and rises with vocabulary spread") {
    val rows = q("agg_simpson_diversity").collect()
    rows.foreach { r =>
      val d = r.getAs[Double]("simpson_index")
      assert(d >= 0.0 && d <= 1.0, s"simpson $d out of range")
    }
  }

  test("Zipf fit recovers a negative log-log slope / positive alpha") {
    val row = q("text_zipf_slope").collect().head
    assert(row.getAs[Long]("n_points") >= 3)
    val slope = row.getAs[Double]("slope_log2")
    assert(slope < 0.0, s"CCDF slope must be negative, got $slope")
    val alpha = row.getAs[Double]("zipf_alpha")
    assert(alpha > 0.0 && alpha < 10.0, s"alpha $alpha implausible")
  }

  test("curriculum: lossless, band = floor(score), order honors bands") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = q("pipeline_quality_curriculum")
    val rows = out.collect()
    assert(rows.length == docs.count(),
      "curriculum must keep every document exactly once")
    rows.foreach { r =>
      assert(r.getAs[Long]("band") == math.floor(r.getAs[Double]("score")).toLong)
    }
    // collected in the contract order: bands must be non-increasing
    val bands = rows.map(_.getAs[Long]("band"))
    assert(bands.zip(bands.tail).forall { case (a, b) => a >= b },
      "output order must be high-quality bands first")
  }
}
