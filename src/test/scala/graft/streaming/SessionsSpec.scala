package graft.streaming

import graft.SparkSpec
import graft.suite.Registry
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming session_window (AvailableNow) == batch session_window") {
    val batchEvents = Registry.tbl(spark, sfDir, "events")
    val batch = Sessions.sessionize(batchEvents, "15 minutes")

    // file-stream sources need a directory: stage the parquet in a tmp dir
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    // ts is a nanos LONG in the raw file; the helper rebuilds the
    // timestamp the same way Registry.tbl does
    val raw = spark.read.parquet(dir.toString)
    Sessions.runAvailableNow(spark, dir.toString, raw,
      "15 minutes", queryName = "sessions_test")
    val streamed = spark.table("sessions_test")

    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stateful flatMapGroupsWithState span == batch min/max/count") {
    val events = Registry.tbl(spark, sfDir, "events")
    val got = Sessions.statefulCounts(spark, events)
    val expected = events
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), min(col("sec")).as("first_sec"),
        max(col("sec")).as("last_sec"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
