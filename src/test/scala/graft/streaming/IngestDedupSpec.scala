package graft.streaming

import graft.SparkSpec
import graft.suite.Registry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Exactly-once ingestion dedup: the watermark-bounded streaming form
  * (`dropDuplicatesWithinWatermark`) removes at-least-once redeliveries
  * and matches the batch `dropDuplicates` on the same doubled input.
  */
class IngestDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming watermark dedup == batch dedup on doubled deliveries") {
    // doubled delivery: the same events file landed twice
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("delivery_1.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("delivery_2.parquet"))

    val raw = spark.read.parquet(dir.toString)
    val batch = IngestDedup.dedupBatch(
      Registry.normalizeTs(raw), Seq("event_id"))

    val stream = IngestDedup.dedupStream(
      Registry.normalizeTs(
        spark.readStream.schema(raw.schema)
          // one file per micro-batch: the second delivery arrives in a
          // LATER batch, so dedup must happen across batch boundaries
          // through the state store, not within a single batch
          .option("maxFilesPerTrigger", "1").parquet(dir.toString)),
      "ts", "1 hour", Seq("event_id"))
    val q = stream.writeStream.format("memory").queryName("ingest_dedup_test")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("ingest_dedup_test")
    val expected = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(batch.count() === expected, "batch dedup must recover the original count")
    assert(got.count() === expected, "stream dedup must recover the original count")
    // row-wise equality via collected canonical rows (exceptAll between
    // a memory-sink table and a batch frame can collide attribute ids)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.selectExpr("event_id", "cast(ts as string)", "user_id",
          "event_type", "cast(value as string)", "props")
        .collect().map(_.mkString("|")).sorted.toSeq
    assert(canon(got) == canon(batch))
  }
}
