package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Running per-user state for [[Sessions.statefulCounts]]. */
final case class UserSpanState(n: Long, lo: Long, hi: Long)

/** Structured Streaming reading of the reference's batch pipeline
  * (SURVEY §2.8): "new job folders arrive, process incrementally". The
  * gaps-and-islands semantic (py:253-286) maps to `session_window`; the
  * custom-state variant shows `flatMapGroupsWithState` for semantics the
  * built-in window can't express.
  */
object Sessions {

  /** Batch/streaming-shared session aggregation: session_window with
    * `gap` merge semantics. Works identically on a batch DataFrame and a
    * readStream source — same code path both ways, which is the point.
    */
  def sessionize(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        unix_timestamp(col("w.end")).as("session_end"),
        col("n_events"))

  /** Streaming ingestion of a parquet events directory with
    * Trigger.AvailableNow (the incremental form of the reference's
    * one-shot os.walk): processes what's there, checkpoints, stops.
    * Returns the in-memory sink table name.
    */
  def runAvailableNow(
      spark: SparkSession,
      eventsDir: String,
      schemaSource: DataFrame,
      gap: String,
      queryName: String): Unit = {
    val stream = spark.readStream
      .schema(schemaSource.schema)
      .parquet(eventsDir)
    val withTs =
      if (schemaSource.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else stream
    val q = sessionize(withTs.withWatermark("ts", "1 hour"), gap)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Custom sessionization state: event count + span per user via
    * flatMapGroupsWithState — the template for stateful semantics beyond
    * session_window (e.g. the reference's two-level islands applied
    * incrementally). Emits one row per user per micro-batch.
    */
  def statefulCounts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserSpanState, (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserSpanState]) =>
          val secs = rows.map(_._2).toSeq
          val prev = state.getOption.getOrElse(UserSpanState(0, Long.MaxValue, Long.MinValue))
          val next = UserSpanState(prev.n + secs.size,
            math.min(prev.lo, if (secs.isEmpty) prev.lo else secs.min),
            math.max(prev.hi, if (secs.isEmpty) prev.hi else secs.max))
          state.update(next)
          Iterator((uid, next.n, next.lo, next.hi))
      }
      .toDF("user_id", "n_events", "first_sec", "last_sec")
  }
}
