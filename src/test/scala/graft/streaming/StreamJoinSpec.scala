package graft.streaming

import graft.SparkSpec
import graft.suite.Registry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class StreamJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("stream-stream interval join (watermarked, AvailableNow) == batch join") {
    val e = Registry.tbl(spark, sfDir, "events")
    val batch = StreamJoins.attributionJoin(
      e.filter(col("event_type") === "view"),
      e.filter(col("event_type") === "purchase"), 1800L)

    val dir = java.nio.file.Files.createTempDirectory("graft_sjoin")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = spark.read.parquet(dir.toString)
    def side(tpe: String) =
      Registry.normalizeTs(spark.readStream.schema(raw.schema).parquet(dir.toString))
        .filter(col("event_type") === tpe).withWatermark("ts", "1 hour")
    // stream-stream inner joins emit in Append mode as the watermark
    // passes; AvailableNow drains the input and finalizes all state
    val q = StreamJoins.attributionJoin(side("view"), side("purchase"), 1800L)
      .writeStream.format("memory").queryName("sjoin_test")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("sjoin_test")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0)
  }

  test("left-outer stream-stream join emits never-converted views exactly once") {
    val e = Registry.tbl(spark, sfDir, "events")
    val batch = StreamJoins.attributionJoin(
      e.filter(col("event_type") === "view"),
      e.filter(col("event_type") === "purchase"), 1800L, "left_outer")

    val dir = java.nio.file.Files.createTempDirectory("graft_sjoin_outer")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = spark.read.parquet(dir.toString)

    // An unmatched view only finalizes once the watermark passes
    // view_ts + window; the real data's tail can never expire itself.
    // Append a far-future sentinel event of each type (excluded from the
    // comparison below) so the final watermark clears every real view —
    // exactly the "one more late heartbeat" a production stream sees.
    // sentinel ts = max(ts) + 2 days, computed in the file's own physical
    // type (nanos LONG or timestamp) so the appended file matches the
    // stream schema exactly
    val bump: org.apache.spark.sql.Column =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        col("m") + lit(172800L * 1000000000L)
      else col("m") + expr("INTERVAL 2 DAYS")
    val sentinel = raw.filter(col("event_type").isin("view", "purchase"))
      .groupBy("event_type").agg(min("event_id").as("event_id"))
      .crossJoin(raw.select(max(col("ts")).as("m")))
      .select(col("event_id"), bump.as("ts"),
        lit(-999L).as("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
    val sentDir = dir.resolve("_sent")
    sentinel.coalesce(1).write.parquet(sentDir.toString)
    val part = java.nio.file.Files.list(sentDir)
      .filter(p => p.getFileName.toString.startsWith("part-")).findFirst.get
    java.nio.file.Files.move(part, dir.resolve("sentinel.parquet"))

    def side(tpe: String) =
      Registry.normalizeTs(spark.readStream.schema(raw.schema).parquet(dir.toString))
        .filter(col("event_type") === tpe).withWatermark("ts", "1 hour")
    val q = StreamJoins.attributionJoin(side("view"), side("purchase"), 1800L, "left_outer")
      .writeStream.format("memory").queryName("sjoin_outer_test")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("sjoin_outer_test").filter(col("user_id") =!= -999L)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // the rows inner-join can't produce: views that never converted,
    // present exactly once each
    val unmatched = streamed.filter(col("purchase_id").isNull)
    assert(unmatched.count() > 0)
    assert(unmatched.groupBy("view_id").count().filter(col("count") > 1).isEmpty)
  }
}
