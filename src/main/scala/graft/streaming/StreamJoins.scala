package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval joins. The canonical training-telemetry shape:
  * attribute each conversion event to every candidate impression from the
  * same user inside a bounded look-back window.
  *
  * Scale shape: an equi-join on `user_id` plus a two-sided event-time
  * range. In streaming, the watermarks + the range bound are exactly what
  * lets Spark evict join state — each side buffers only rows younger than
  * (watermark - window), so state is O(window x arrival rate), never the
  * full history. In batch, the same code plans as a hash join on user_id
  * with the range as residual condition. One code path both ways
  * (StreamJoinSpec proves stream == batch on the same input).
  */
object StreamJoins {

  /** Join `conversions` to all `impressions` of the same user within
    * `[impression_ts, impression_ts + windowSec]`. Inputs must carry
    * (user_id, ts, event_id); pass streaming frames with watermarks
    * already applied (a no-op on batch frames).
    *
    * Emits (user_id, view_id, purchase_id, delta_sec), delta in whole
    * seconds by integer division — engine-exact.
    *
    * `joinType`: "inner" (default) or "left_outer". Left-outer answers
    * the attribution question's other half — views that never converted.
    * On a stream Spark holds an unmatched view only until the watermark
    * passes `view_ts + windowSec` (the range bound closes the match
    * window), then emits it once with null purchase columns; join state
    * stays O(window x arrival rate) either way.
    */
  def attributionJoin(
      impressions: DataFrame,
      conversions: DataFrame,
      windowSec: Long,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"attributionJoin supports inner/left_outer only, got '$joinType' " +
        "(other outer types have different streaming watermark contracts)")
    val v = impressions.select(col("user_id"), col("ts").as("view_ts"),
      col("event_id").as("view_id"))
    val p = conversions.select(col("user_id").as("p_user"),
      col("ts").as("purchase_ts"), col("event_id").as("purchase_id"))
    v.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $windowSec SECONDS"),
        joinType)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        expr("(unix_micros(purchase_ts) - unix_micros(view_ts)) div 1000000")
          .as("delta_sec"))
  }
}
