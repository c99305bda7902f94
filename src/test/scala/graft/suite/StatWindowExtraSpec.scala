package graft.suite

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Invariants of the round-8 stats/window/graph additions — the oracle
  * proves engine agreement; these prove the numbers mean what they
  * claim (resampling calibration, privacy-flag consistency, exact
  * interpolation algebra, link-prediction bounds).
  */
class StatWindowExtraSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("bootstrap CI: 32 resamples, ordered band, near the full mean") {
    val r = run("stat_bootstrap_ci").head
    assert(r.getAs[Long]("n_resamples") == 32)
    val (lo, hi, full) = (r.getAs[Double]("ci_lo_mean"),
      r.getAs[Double]("ci_hi_mean"), r.getAs[Double]("full_mean_cents"))
    assert(lo <= hi)
    // a 90%-ish band at B=32 should sit within a few percent of the
    // point estimate on thousands of draws — this catches a broken
    // multiplicity hash (all-zero or all-max collapses the band or
    // shifts it far off)
    assert(math.abs(lo - full) / full < 0.2, s"lo=$lo vs full=$full")
    assert(math.abs(hi - full) / full < 0.2, s"hi=$hi vs full=$full")
  }

  test("bootstrap multiplicity hash is Poisson(1)-calibrated: mean ~ 1") {
    import graft.operators.Sampling
    val h = Sampling.hashBucket(
      concat(col("o_orderkey").cast("string"), lit("|"),
        col("b").cast("string")), 10000)
    val m = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(explode(sequence(lit(0), lit(31))).as("b"), col("o_orderkey"))
      .select(when(h < 3679, 0L).when(h < 7358, 1L).when(h < 9197, 2L)
        .when(h < 9810, 3L).when(h < 9963, 4L).otherwise(5L).as("m"))
      .agg(avg(col("m"))).head.getDouble(0)
    // E[m] = 0.9995 under the per-mille pmf with the tail folded at 5
    assert(math.abs(m - 1.0) < 0.05, s"mean multiplicity $m")
  }

  test("k-anonymity: group sizes partition the table, flag == (n < k)") {
    val rows = run("dq_k_anonymity").collect()
    val total = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("at_risk") == (r.getAs[Long]("n") < 5))
    }
  }

  test("linear interpolation: dense spine, identity on observed rows, " +
    "exact convex fill recomputable from the output alone") {
    val out = run("win_interpolate_linear").collect()
    val byType = out.groupBy(_.getAs[String]("event_type"))
    assert(byType.nonEmpty)
    var filledChecked = 0
    byType.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("bucket_start"))
      val hs = sorted.map(_.getAs[Long]("bucket_start"))
      assert(hs.last - hs.head == 3600L * (hs.length - 1), "spine not dense")
      sorted.foreach { r =>
        if (!r.isNullAt(r.fieldIndex("v_obs")))
          assert(r.getAs[Double]("v_interp") == r.getAs[Long]("v_obs").toDouble)
      }
      // recompute each filled value from the nearest observed neighbors
      val obs = sorted.zipWithIndex.filterNot(_._1.isNullAt(2)).map {
        case (r, i) => (i, r.getAs[Long]("bucket_start"), r.getAs[Long]("v_obs"))
      }
      sorted.zipWithIndex.filter(_._1.getAs[Boolean]("filled")).foreach {
        case (r, i) =>
          val h = r.getAs[Long]("bucket_start")
          val (_, ph, pv) = obs.filter(_._1 < i).last
          val (_, nh, nv) = obs.find(_._1 > i).get
          val expected = (pv * (nh - h) + nv * (h - ph)).toDouble / (nh - ph)
          assert(r.getAs[Double]("v_interp") == expected,
            s"fill at $h: ${r.getAs[Double]("v_interp")} != $expected")
          filledChecked += 1
      }
    }
    assert(filledChecked > 0, "no interior gap exercised the fill path")
  }

  test("log histogram: buckets partition the rows and bound their cells " +
    "by consecutive powers of two") {
    val rows = run("agg_log_histogram").collect()
    val nOrders = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nOrders)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val (lo, hi) = (r.getAs[Long]("lo"), r.getAs[Long]("hi"))
      assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"bucket $b cells [$lo,$hi] outside [2^$b, 2^${b + 1})")
      assert(lo <= hi)
    }
  }

  test("lateness profile: histogram masses sum to the event count per type") {
    val rows = run("stream_lateness_profile").collect()
    val perType = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum == perType(t))
      val mx = rs.map(_.getAs[Long]("max_late_sec")).distinct
      assert(mx.length == 1 && mx.head >= 0)
      // the max must land in the last occupied bucket
      assert(mx.head / 3600 == rs.map(_.getAs[Long]("late_bucket")).max)
    }
  }

  test("cut spans: token accounting closes, uncut docs round-trip, and " +
    "cutting strictly reduces cross-doc duplicated grams") {
    import graft.text.TextFunctions
    val out = run("pipeline_cut_spans")
    val rows = out.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cut") <= r.getAs[Long]("n_words"))
    }
    // rebuilt text re-tokenizes to exactly n_words - n_cut tokens
    val bad = out
      .withColumn("n_tok",
        coalesce(size(TextFunctions.tokens(col("text_clean"))), lit(0)))
      .filter(when(col("text_clean") === "", lit(0L))
        .otherwise(col("n_tok").cast("long"))
        =!= col("n_words") - col("n_cut"))
      .count()
    assert(bad == 0, s"$bad docs with token accounting open")
    def dupGrams(docs: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.expressions.Window
      val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val (b, p) = (graft.dedup.Dedup.ShingleBase, graft.dedup.Dedup.MinhashP)
      graft.dedup.Dedup.docWordIds(docs, "doc_id", "text")
        .withColumn("w1", lead(col("word_id"), 1).over(wd))
        .withColumn("w2", lead(col("word_id"), 2).over(wd))
        .withColumn("w3", lead(col("word_id"), 3).over(wd))
        .withColumn("w4", lead(col("word_id"), 4).over(wd))
        .where(col("w4").isNotNull)
        .select(col("doc_id"),
          (((((col("word_id") * b + col("w1")) % p * b + col("w2")) % p
            * b + col("w3")) % p * b + col("w4")) % p).as("gid"))
        .groupBy("gid").agg(countDistinct(col("doc_id")).as("nd"))
        .where(col("nd") >= 2).count()
    }
    val before = dupGrams(spark.read.parquet(s"$sfDir/documents.parquet"))
    val after = dupGrams(out.select(col("doc_id"), col("text_clean").as("text")))
    val anyCuts = rows.exists(_.getAs[Long]("n_cut") > 0)
    if (anyCuts) assert(after < before, s"dup grams $before -> $after")
  }

  test("best run equals the O(n^2) brute-force maximum subarray per type") {
    val out = run("win_best_run").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("best_sum"), r.getAs[Long]("end_event_id"))).toMap
    val rows = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", "event_id",
        "cast(round(value * 100) as long) as cents")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { case (t, rs) =>
      val xs = rs.sortBy(_._2)
      val avg = xs.map(_._3).sum / xs.length
      val sig = xs.map(_._3 - avg)
      var best = Long.MinValue
      var bestEnd = 0L
      for (i <- sig.indices; j <- i until sig.length) {
        val s = sig.slice(i, j + 1).sum
        // mirror the query's tie-break: best desc, then smallest end id
        if (s > best || (s == best && xs(j)._2 < bestEnd)) {
          best = s; bestEnd = xs(j)._2
        }
      }
      assert(out(t) == ((best, bestEnd)), s"type $t: ${out(t)} != ($best, $bestEnd)")
    }
  }

  test("column profile: census is internally consistent") {
    val rows = run("dq_column_profile").collect()
    assert(rows.length == 6)
    val n = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      val nn = r.getAs[Long]("n_null")
      val nd = r.getAs[Long]("n_distinct")
      assert(nd >= 1 && nd <= n - nn)
      assert(r.getAs[String]("min_v") <= r.getAs[String]("max_v"))
    }
  }

  test("Markov stationary: masses stay near the 1e6 budget after 4 rounds") {
    val rows = run("agg_markov_stationary").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("mass_q6")).sum
    // each round loses < |types|^2 millionths to the floor div and the
    // row-normalization floor loses < |types| per row; 4 rounds over a
    // handful of states stays within ~3% of the exact unit mass
    assert(total <= 1000000L && total > 970000L, s"total mass $total")
    rows.foreach(r => assert(r.getAs[Long]("mass_q6") >= 0))
  }

  test("as-of tolerance: attached features are fresh, stale ones are null") {
    val rows = run("join_asof_tolerance").collect()
    val tol = 2L * 86400
    rows.foreach { r =>
      val kIdx = r.fieldIndex("fresh_cents")
      val aIdx = r.fieldIndex("age_sec")
      assert(r.isNullAt(kIdx) == r.isNullAt(aIdx),
        "feature and age must be attached or withheld together")
      if (!r.isNullAt(aIdx)) {
        val age = r.getAs[Long]("age_sec")
        assert(age >= 0 && age <= tol, s"stale/negative age $age attached")
      }
    }
    assert(rows.exists(!_.isNullAt(rows.head.fieldIndex("fresh_cents"))),
      "no fresh match anywhere — degenerate fixture")
    assert(rows.exists(_.isNullAt(rows.head.fieldIndex("fresh_cents"))),
      "no stale/missing match anywhere — tolerance unexercised")
  }

  test("Adamic-Adar: oriented non-self pairs, positive descending scores") {
    val rows = run("graph_adamic_adar").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("p1") < r.getAs[Long]("p2"))
      assert(r.getAs[Long]("aa_score_q") > 0)
    }
    val scores = rows.map(_.getAs[Long]("aa_score_q"))
    assert(scores.sameElements(scores.sortBy(-_)), "not score-descending")
  }
}
