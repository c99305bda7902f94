package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Input to the media-decode stage: an opaque binary payload + typed
  * metadata, the multimodal column convention of the extension brief.
  */
final case class MediaBlob(doc_id: Long, fmt: String, content: Array[Byte])

/** Output of the decoder. `px_hash` is a CRC32 over the decoded ARGB
  * pixels (row-major) when the payload really decoded; None on the
  * stub/header-only paths.
  */
final case class MediaMeta(
    doc_id: Long,
    fmt: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    px_hash: Option[Long] = None)

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

  /** Real header parsing for the formats whose dimensions live in plain
    * bytes — no codec library needed: PNG IHDR (big-endian at offset
    * 16), GIF logical screen descriptor (little-endian at 6), JPEG SOFn
    * segment scan. Returns None for payloads that aren't recognizable
    * images; pixel decoding (which WOULD need a codec) stays stubbed.
    */
  def parseImageHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    if (b.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G') {
      val w = (u8(16) << 24) | (u8(17) << 16) | (u8(18) << 8) | u8(19)
      val h = (u8(20) << 24) | (u8(21) << 16) | (u8(22) << 8) | u8(23)
      Some(("png", w, h))
    } else if (b.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
      // full GIF87a/GIF89a signature: "GIF" alone also matches ordinary
      // text ("GIFs are..."), which must fall through to the stub
      Some(("gif", u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8)))
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 1 < b.length) {
        if (u8(i) == 0xff && u8(i + 1) != 0xff) {
          val m = u8(i + 1)
          // standalone markers carry no length field
          if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) { i += 2 }
          else {
            val isSof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof) {
              if (i + 8 < b.length) {
                val h = (u8(i + 5) << 8) | u8(i + 6)
                val w = (u8(i + 7) << 8) | u8(i + 8)
                return Some(("jpeg", w, h))
              } else return None // truncated before the dimension bytes
            }
            if (i + 3 >= b.length) return None
            i += 2 + ((u8(i + 2) << 8) | u8(i + 3)) // skip this segment
          }
        } else i += 1
      }
      None
    } else None
  }

  /** CRC32 over the ARGB ints of a decoded image, row-major big-endian —
    * a deterministic pixel fingerprint (PNG/GIF/BMP decode losslessly,
    * so the value is stable across JVMs).
    */
  def pixelCrc(im: java.awt.image.BufferedImage): Long = {
    val c = new java.util.zip.CRC32()
    val buf = new Array[Byte](4)
    var y = 0
    while (y < im.getHeight) {
      var x = 0
      while (x < im.getWidth) {
        val p = im.getRGB(x, y)
        buf(0) = (p >>> 24).toByte; buf(1) = (p >>> 16).toByte
        buf(2) = (p >>> 8).toByte; buf(3) = p.toByte
        c.update(buf, 0, 4)
        x += 1
      }
      y += 1
    }
    c.getValue
  }

  /** Largest pixel count decodeOne will actually decode — a header
    * declaring more is served its header dimensions only. Guards
    * against decompression bombs (a tiny blob whose IHDR declares
    * gigapixel dimensions would otherwise allocate w*h ints).
    */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Decode one blob. Lossless images decode for REAL: the JDK's
    * ImageIO reads PNG/GIF/BMP pixels with no external codec, giving
    * true dimensions plus a pixel fingerprint. JPEG stops at header
    * dimensions — its decoded pixels are not bit-stable across JVM
    * IDCT implementations, which would poison the deterministic
    * px_hash contract. A recognizable-but-corrupt image falls back to
    * its header dimensions (no pixel hash; JDK readers throw
    * RuntimeExceptions, not just IOException, on corrupt payloads);
    * anything else (audio/video — genuinely codec-less here) takes the
    * deterministic stub.
    */
  def decodeOne(b: MediaBlob): MediaMeta =
    parseImageHeader(b.content) match {
      case Some((fmt, w, h)) =>
        val decodable = fmt != "jpeg" &&
          w.toLong * math.max(h.toLong, 1L) <= MaxDecodePixels
        val decoded =
          if (!decodable) None
          else
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(b.content)))
            catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some(im) =>
            MediaMeta(b.doc_id, fmt, b.content.length.toLong,
              im.getWidth, im.getHeight, n_frames = 1,
              px_hash = Some(pixelCrc(im)))
          case None =>
            MediaMeta(b.doc_id, fmt, b.content.length.toLong, w, h, n_frames = 1)
        }
      case None => decodeStub(b)
    }

  /** STUB decoder for the genuinely codec-less media kinds (audio,
    * video): a real codec call goes here (e.g. ffmpeg via JNI). The fake
    * derives width/height/frames deterministically from the payload size
    * so tests and oracles can check the plumbing.
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
      it.map(decodeOne)
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

  /** Deterministic real-image test vectors (ImageIO-encoded, so the
    * decoded pixels — and therefore [[pixelCrc]] — are fixed): a 3x2 RGB
    * PNG and a 2x2 GIF. Used by the decode oracle and specs; the
    * expected constants live next to them.
    */
  val FixturePngB64: String =
    "iVBORw0KGgoAAAANSUhEUgAAAAMAAAACCAIAAAASFvFNAAAAFUlEQVR4XmP4z8DAAMH//4PohoYGAEfPB3tHPST0AAAAAElFTkSuQmCC"
  val FixturePngCrc: Long = 3823109364L // 3x2, 78 bytes
  val FixtureGifB64: String =
    "R0lGODlhAgACAPEAAAAA/wD/AP8AAP///ywAAAAAAgACAEEIBwAFBAAwICAAOw=="
  val FixtureGifCrc: Long = 904861039L // 2x2, 46 bytes

  /** The two real-image fixture blobs as a dataset (doc_id -1 = png,
    * -2 = gif — ids that can never collide with the documents table).
    */
  def fixtureImageBlobs(spark: SparkSession): Dataset[MediaBlob] = {
    import spark.implicits._
    val dec = java.util.Base64.getDecoder
    Seq(
      MediaBlob(-1L, "image", dec.decode(FixturePngB64)),
      MediaBlob(-2L, "image", dec.decode(FixtureGifB64))
    ).toDS()
  }
}
