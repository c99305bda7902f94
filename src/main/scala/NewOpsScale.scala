// sf0.1 vs sf1 replay of the round-5 third-batch operators (temporary tool)
object NewOpsScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("newops-scale")
    val qs = Seq(
      "dedup_substring_spans", "graph_degree_hist", "graph_triangle_topk",
      "graph_cc_components", "graph_common_neighbors",
      "win_forward_fill", "win_ewma", "agg_mad", "agg_corr_exact",
      "win_anomaly_mad", "join_interval_overlap", "pipeline_scd2_history",
      "pipeline_data_card", "sim_ivf_prefix_rerank", "join_asof_forward",
      "stream_sliding_window")
    for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/tmp/sf1")) {
      val t0 = System.nanoTime()
      graft.suite.GraphQueries.prebuildArtifacts(spark, dir)
      graft.suite.SimilarityQueries.prebuildArtifacts(spark, dir)
      println(f"SCALEPROBE $dir setup ${(System.nanoTime()-t0)/1e9}%.2f")
      qs.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        fn(spark, dir).count()  // warm (plan+JIT)
        val t1 = System.nanoTime()
        val rows = fn(spark, dir).count()
        println(f"SCALEPROBE $dir $n ${(System.nanoTime()-t1)/1e9}%.3f rows=$rows")
      }
    }
    spark.stop()
  }
}
