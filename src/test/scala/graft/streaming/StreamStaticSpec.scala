package graft.streaming

import graft.SparkSpec
import graft.suite.Registry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream-static enrichment — the remaining stream-join shape after
  * stream-stream (StreamJoinSpec): a streaming fact side joined to a
  * static dimension. Spark broadcasts/rescans the static side per
  * micro-batch with no state at all, so this is the cheapest join a
  * stream can do — the spec pins stream == batch through the same code
  * path.
  */
class StreamStaticSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("stream-static dimension join (AvailableNow) == batch join") {
    val customers = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_nationkey"))

    def enrich(events: org.apache.spark.sql.DataFrame) =
      events.join(customers, Seq("user_id"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))

    val batchEvents = Registry.tbl(spark, sfDir, "events")
    val expected = enrich(batchEvents)

    val dir = java.nio.file.Files.createTempDirectory("graft_sstatic")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = spark.read.parquet(dir.toString)
    val streamed = enrich(
      Registry.normalizeTs(spark.readStream.schema(raw.schema).parquet(dir.toString)))
    val q = streamed.writeStream.format("memory").queryName("sstatic_test")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("sstatic_test")
    assert(got.count() === expected.count() && expected.count() > 0)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
