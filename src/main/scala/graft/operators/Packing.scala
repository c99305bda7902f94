package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining-style pipelines: lay documents
  * end-to-end per stratum (in key order) and slice the concatenated
  * token stream into fixed-size context windows. Each document gets its
  * global token offsets and the first/last window it lands in — the
  * GPT-style concat-and-chunk layout, computed as one partitioned
  * prefix-sum window (one shuffle per stratum, no sequential driver
  * pass, scales to any corpus).
  */
object Packing {

  def packOffsets(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      nTokensCol: String,
      windowTokens: Long): DataFrame =
    Windows.prefixOffsets(df, Seq(stratumCol), keyCol, nTokensCol)
      .withColumn("first_window", expr(s"start_off div $windowTokens"))
      .withColumn("last_window", expr(s"(end_off - 1) div $windowTokens"))
}
