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
      windowTokens: Long): DataFrame = {
    require(windowTokens > 0, s"window size must be positive, got $windowTokens")
    // greatest(start, end-1): a zero-length item occupies (only) its
    // start window instead of producing last_window < first_window (and
    // `div` of -1 would disagree with the oracle's floor division)
    Windows.prefixOffsets(df, Seq(stratumCol), keyCol, nTokensCol)
      .withColumn("first_window", expr(s"start_off div $windowTokens"))
      .withColumn("last_window",
        expr(s"greatest(start_off, end_off - 1) div $windowTokens"))
  }
}
