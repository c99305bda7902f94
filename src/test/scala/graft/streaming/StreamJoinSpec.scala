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
}
