package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Input to the media-decode stage: an opaque binary payload + typed
  * metadata, the multimodal column convention of the extension brief.
  */
final case class MediaBlob(doc_id: Long, fmt: String, content: Array[Byte])

/** Output of the (stubbed) decoder. */
final case class MediaMeta(
    doc_id: Long,
    fmt: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded batch-wise inside executors.
  *
  * The real Spark machinery — schema, partition-parallel batch decode via
  * typed `mapPartitions`, deterministic output schema — is implemented
  * and tested; the pixel/sample decode itself is a clearly marked STUB
  * (this container ships no image/audio codecs) that derives
  * deterministic fake dimensions from the byte content, so the plumbing
  * is oracle-checkable end-to-end.
  */
object Multimodal {

  /** Byte-level metadata over a binary column — length, content hash,
    * magic prefix. Pure built-ins; at scale this runs in the scan stage.
    */
  def binaryMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(binCol)).cast("long").as("n_bytes"),
      sha2(col(binCol), 256).as("sha"),
      hex(expr(s"substring($binCol, 1, 4)")).as("magic"))

  /** STUB decoder: a real codec call goes here (e.g. libjpeg/ffmpeg via
    * JNI). The fake derives width/height/frames deterministically from
    * the payload size so tests and oracles can check the plumbing.
    */
  def decodeStub(b: MediaBlob): MediaMeta = {
    val n = b.content.length.toLong
    MediaMeta(
      b.doc_id, b.fmt, n,
      width = (64 + n % 1024).toInt,
      height = (64 + (n * 7) % 768).toInt,
      n_frames = if (b.fmt == "video") (1 + n % 240).toInt else 1)
  }

  /** Batch decode: typed mapPartitions — one decoder instance per
    * partition (the expensive init a real codec needs), streaming through
    * the rows without materializing the partition.
    */
  def decode(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // real impl: open codec context once per partition here
      it.map(decodeStub)
    }
  }

  /** Frame sampling: every `step`-th frame index per video. Relational
    * explode — one output row per sampled frame.
    */
  def sampleFrames(meta: DataFrame, step: Int): DataFrame =
    meta.filter(col("n_frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))

  /** Build a MediaBlob dataset from the documents table (text bytes stand
    * in for media payloads; fmt cycles deterministically).
    */
  def blobsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaBlob] = {
    import spark.implicits._
    docs.select(
        col("doc_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaBlob]
  }
}
