package graft.suite

import graft.SparkSpec

/** Invariants of the cleaning-funnel audit (`pipeline_filter_funnel`):
  * conservation (each stage's output feeds the next stage's input; no
  * document created or lost between stages) and agreement with the
  * pipeline it audits (`pipeline_clean_corpus` — the funnel's terminal
  * n_out must equal the cleaned corpus's row count, since the funnel
  * re-states exactly the gates that pipeline applies).
  */
class FunnelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("funnel stages chain and terminal n_out equals the cleaned corpus size") {
    val rows = graft.SparkEntry.queries("pipeline_filter_funnel")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

    assert(rows.map(_._1).toSeq ==
      Seq("1_lang_gate", "2_quality_gate", "3_token_band", "4_exact_dedup"))
    // per-stage conservation: in = rejected + out
    rows.foreach { case (st, in, rej, out) =>
      assert(in == rej + out, s"$st: $in != $rej + $out")
    }
    // chaining: stage k's out is stage k+1's in
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 == b._2, s"${a._1}.n_out ${a._4} != ${b._1}.n_in ${b._2}")
    }
    // the funnel starts at the full corpus
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.head._2 == n)
    // and ends exactly where the composed cleaning pipeline ends
    val cleaned = graft.SparkEntry.queries("pipeline_clean_corpus")(spark, dir).count()
    assert(rows.last._4 == cleaned,
      s"funnel terminal ${rows.last._4} != clean_corpus $cleaned")
  }
}
