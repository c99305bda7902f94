package graft.streaming

import graft.SparkSpec
import graft.operators.Hll
import org.apache.spark.sql.functions._

/** The stream_hll_distinct contract: HLL register aggregation is a plain
  * max — associative and arrival-order-insensitive — so the SAME
  * Hll.registers code path over a readStream source (micro-batched,
  * out-of-order, late rows for an earlier day in a later file) produces
  * EXACTLY the batch registers, and therefore the identical estimate.
  * This is the bounded-state streaming-cardinality story: 256 rows of
  * state per day regardless of true cardinality.
  */
class StreamingHllSpec extends SparkSpec {

  test("streaming HLL registers over out-of-order micro-batches == batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hll")
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // day-1 users, day-2 users, then LATE day-1 arrivals in a third file
    val batches = Seq(
      (0 until 3000).map(i => (i.toLong, ts(86400L + i))),
      (0 until 2500).map(i => ((i * 7 + 1).toLong, ts(2 * 86400L + i))),
      (0 until 1500).map(i => ((i * 3).toLong, ts(86400L + 40000 + i))))
    batches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("user_id", "ts").repartition(1).write.parquet(s"$dir/b$i")
    }
    val all = batches.flatten.toDF("user_id", "ts")

    def regs(df: org.apache.spark.sql.DataFrame) =
      Hll.registers(
        df.select(to_date(col("ts")).as("d"), col("user_id")),
        Seq("d"), col("user_id"))

    val expected = regs(all)
    val q = regs(spark.readStream.schema("user_id LONG, ts TIMESTAMP")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1") // force separate micro-batches
        .parquet(dir.toString))
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("hll_regs")

    assert(streamed.count() === expected.count())
    assert(streamed.exceptAll(expected).isEmpty &&
      expected.exceptAll(streamed).isEmpty,
      "streamed registers differ from batch registers")

    val eStream = Hll.estimate(streamed, Seq("d"))
      .orderBy("d").collect().toSeq
    val eBatch = Hll.estimate(expected, Seq("d"))
      .orderBy("d").collect().toSeq
    assert(eStream === eBatch, "estimates diverge between stream and batch")
  }
}
