package graft.streaming

import graft.SparkSpec
import graft.suite.Registry
import org.apache.spark.sql.functions._

/** The foreachBatch upsert sink: streamed micro-batches converge to the
  * same latest-state table as one batch merge, replays are no-ops (both
  * algebraically and via the batch-id marker), and out-of-order arrival
  * cannot regress a key (last-writer-wins under the total order).
  */
class UpsertSinkSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def prepared = {
    Registry.tbl(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_c"),
        unix_timestamp(col("ts")).as("sec"))
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("user_id", "event_id", "event_type", "value_c", "sec")
      .collect().map(_.mkString("|")).sorted.toSeq

  test("streamed micro-batches == one batch merge; replay is a no-op") {
    val e = prepared
    val keys = Seq("user_id")
    val ord = Seq("sec", "event_id")
    val expected = UpsertSink.mergeBatch(e.limit(0), e, keys, ord)

    // three delivery files -> three micro-batches
    val in = java.nio.file.Files.createTempDirectory("graft_upsert_in")
    (0 until 3).foreach { i =>
      // the file stream source lists FILES, not directory-tables: stage
      // the write, then move its single part file into the input dir
      val stage = java.nio.file.Files.createTempDirectory(s"graft_upsert_stage$i")
      e.filter(col("event_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, in.resolve(s"delivery_$i.parquet"))
    }
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_upsert_state").toString

    val q = UpsertSink.upsertStream(
        spark.readStream.schema(e.schema)
          .option("maxFilesPerTrigger", "1").parquet(in.toString),
        statePath, keys, ord)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_upsert_ckpt").toString)
      .start()
    q.awaitTermination()

    val got = UpsertSink.readState(spark, statePath)
    assert(got.count() == expected.count())
    assert(canon(got) == canon(expected), "stream state != batch merge")

    // crash-replay: re-applying an already-seen batch id changes nothing
    UpsertSink.applyBatch(e.filter(col("event_id") % 3 === 2), 0L,
      statePath, keys, ord)
    assert(canon(UpsertSink.readState(spark, statePath)) == canon(expected))

    // late out-of-order delivery in a NEW batch: older rows for existing
    // keys cannot regress the state (last-writer-wins)
    val stale = e.withColumn("sec", col("sec") - 1000000L)
    UpsertSink.applyBatch(stale, 99L, statePath, keys, ord)
    assert(canon(UpsertSink.readState(spark, statePath)) == canon(expected))
  }
}
