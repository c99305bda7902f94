package graft.suite

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the entity-resolution / coverage / decomposition /
  * centrality / coordinated-sampling additions.
  */
class ResolutionCoverageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    StatQueries.all.concat(ExtrasQueries.all).concat(WindowExtraQueries.all)
      .concat(GraphQueries.all).concat(SamplingQueries.all)
      .find(_.name == name).get.fn(spark, sf)

  test("entity resolution equals the naive quadratic within-nation join") {
    val blocked = q("join_entity_resolution").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
        col("c_name").as("nm"))
    val naive = c.as("a").join(c.as("b"),
        col("a.nk") === col("b.nk") && col("a.k") < col("b.k") &&
          levenshtein(col("a.nm"), col("b.nm")) <= 1)
      .select(col("a.k"), col("b.k")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == naive, "deletion-neighborhood blocking must have full recall")
    assert(naive.nonEmpty)
  }

  test("interval coverage is bounded by the span and below the session sum") {
    val row = q("win_interval_coverage").collect().head
    val covered = row.getAs[Long]("covered_sec")
    val nMerged = row.getAs[Long]("n_merged")
    val ev = graft.suite.Registry.tbl(spark, sf, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
    val sess = graft.operators.Islands
      .islands(ev, Seq("user_id"), "sec", maxGap = 1800L, minLen = 3L)
    val stats = sess.agg(count(lit(1)).as("n"),
      sum(col("island_end") - col("island_start") + 1).as("len_sum"),
      (max(col("island_end")) - min(col("island_start")) + 1).as("span"))
      .collect().head
    assert(covered <= stats.getAs[Long]("len_sum"),
      "union length cannot exceed the sum of interval lengths")
    assert(covered <= stats.getAs[Long]("span"))
    assert(covered >= 1L && nMerged >= 1L && nMerged <= stats.getAs[Long]("n"))
  }

  test("seasonal decomposition: residual identity, positive indices, trend bounds") {
    val rows = q("win_seasonal_decompose").collect()
    assert(rows.nonEmpty)
    val maxN = rows.map(_.getAs[Long]("n")).max.toDouble
    rows.foreach { r =>
      val (n, trend, idx, resid) = (r.getAs[Long]("n"), r.getAs[Double]("trend"),
        r.getAs[Double]("dow_index"), r.getAs[Double]("residual"))
      assert(math.abs((n - trend) - resid) == 0.0, "residual must be exactly n - trend")
      assert(idx > 0.0 && trend > 0.0 && trend <= maxN)
    }
  }

  test("sampled harmonic centrality: n1 equals seed degree in the support graph") {
    val rows = q("graph_closeness_sampled").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("harmonic_x6")
      assert(h == 6 * r.getAs[Long]("n1") + 3 * r.getAs[Long]("n2") +
        2 * r.getAs[Long]("n3"))
    }
  }

  test("LSH recall audit: confusion counts are consistent and recall is measured") {
    val r = DedupQueries.all.find(_.name == "dedup_lsh_recall_audit").get
      .fn(spark, sf).collect().head
    val (cand, truth, tp) = (r.getAs[Long]("n_candidates"),
      r.getAs[Long]("n_truth"), r.getAs[Long]("tp"))
    assert(tp <= math.min(cand, truth))
    assert(r.getAs[Long]("fn") == truth - tp)
    assert(r.getAs[Long]("fp") == cand - tp)
    assert(r.getAs[Long]("recall_x1e6") >= 0L &&
      r.getAs[Long]("recall_x1e6") <= 1000000L)
    assert(truth > 0L, "audit needs a non-empty truth set to mean anything")
  }

  test("RAKE keywords: scores are the exact degree/freq ratio, ranked") {
    val rows = TextQueries.all.find(_.name == "text_rake_keywords").get
      .fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("freq") >= 3L)
      assert(r.getAs[Long]("degree") >= r.getAs[Long]("freq"),
        "every occurrence contributes at least phrase length 1 to degree")
      assert(r.getAs[Long]("score_x1000") ==
        r.getAs[Long]("degree") * 1000 / r.getAs[Long]("freq"))
    }
    val scores = rows.map(_.getAs[Long]("score_x1000"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("coordinated sample keeps referential integrity without a repair join") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .filter(graft.operators.Sampling.hashBucket(col("o_orderkey"), 1000) < 100)
      .select(col("o_orderkey"))
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(graft.operators.Sampling.hashBucket(col("l_orderkey"), 1000) < 100)
      .select(col("l_orderkey"))
    // every sampled lineitem's parent order is in the sampled orders
    val orphans = l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
    assert(orphans.count() == 0L)
    assert(l.count() > 0L && o.count() > 0L)
  }
}
