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

  test("incremental file arrival: second AvailableNow run picks up new files only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_incr")
    def write(name: String, rows: Seq[(Long, java.sql.Timestamp)]): Unit =
      rows.toDF("user_id", "ts").write.parquet(s"$dir/$name")
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)

    write("batch1", Seq((1L, ts(1000)), (1L, ts(1100))))
    val checkpoint = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    def runOnce(qn: String): Unit = {
      val q = Sessions.sessionize(
        spark.readStream.schema("user_id LONG, ts TIMESTAMP")
          .option("recursiveFileLookup", "true").parquet(dir.toString)
          .withWatermark("ts", "1 hour"), "15 minutes")
        .writeStream.format("memory").queryName(qn)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce("incr_1")
    assert(spark.table("incr_1").count() === 1) // one session so far

    // new bundle arrives -> next AvailableNow run extends the result
    write("batch2", Seq((2L, ts(5000)), (2L, ts(5100))))
    runOnce("incr_2")
    val sessions = spark.table("incr_2")
      .select("user_id").collect().map(_.getLong(0)).sorted
    assert(sessions.toSeq === Seq(1L, 2L))
  }

  test("incremental islands over micro-batches converge to the batch islands") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_isl")
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // out-of-order arrival, including a value that bridges two islands
    val batches = Seq(
      Seq((1L, ts(1000)), (1L, ts(1200)), (2L, ts(50000))),
      Seq((1L, ts(9000)), (1L, ts(9300)), (1L, ts(9600))),
      Seq((1L, ts(5000)), (1L, ts(3000)), (1L, ts(7000)), (2L, ts(50060))))
    batches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("user_id", "ts").repartition(1).write.parquet(s"$dir/b$i")
    }
    val all = batches.flatten.toDF("user_id", "ts")
    val expected = Sessions.statefulIslands(spark, all, 2000L)

    val acc = scala.collection.concurrent.TrieMap.empty[Long, Seq[org.apache.spark.sql.Row]]
    val q = Sessions.statefulIslands(spark,
        spark.readStream.schema("user_id LONG, ts TIMESTAMP")
          .option("recursiveFileLookup", "true")
          .option("maxFilesPerTrigger", "1").parquet(dir.toString),
        2000L)
      .writeStream
      .outputMode("update") // the operator emits keyed snapshot upserts
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().groupBy(_.getLong(0)).foreach { case (u, rs) => acc(u) = rs.toSeq }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = acc.values.flatten.toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sorted
    val batch = expected.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sorted.toSeq
    assert(streamed === batch)
    // sanity: the bridge event merged user 1 into one island spanning 1000..9600
    assert(streamed.filter(_._1 == 1L).map(t => (t._3, t._4, t._5)) ===
      Seq((1000L, 9600L, 8L)))
  }

  test("streaming dedup keeps the first arrival across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup")
    Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
      .repartition(1).write.parquet(s"$dir/b0")
    Thread.sleep(1100) // file source orders batches by mtime: force b0 < b1
    Seq((3L, "alpha beta"), (4L, "delta")).toDF("doc_id", "text") // 3 dups 1
      .repartition(1).write.parquet(s"$dir/b1")

    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = Sessions.dedupByFingerprint(
        spark.readStream.schema("doc_id LONG, text STRING")
          .option("recursiveFileLookup", "true")
          .option("maxFilesPerTrigger", "1").parquet(dir.toString),
        "text")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        acc.synchronized {
          acc ++= df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    // doc 3 (late duplicate of doc 1's text) never surfaces
    assert(acc.map(_._1).sorted.toSeq === Seq(1L, 2L, 4L))
    assert(acc.map(_._2).toSet === Set("alpha beta", "gamma", "delta"))
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
