package graft.multimodal

import graft.SparkSpec

/** REAL video pixel decode (uncompressed-DIB AVI). Three layers:
  * byte-level ground truth (a hand-written DIB frame with distinct
  * corner colors proves the bottom-up/BGR/stride conventions — a
  * writer+parser that agreed on the WRONG convention would pass a
  * round-trip but fail this), round-trip over the pattern fixtures
  * (odd width exercises row padding), and gate behavior (non-AVI RIFF,
  * text, MP4 all rejected).
  */
class AviDecodeSpec extends SparkSpec {

  test("hand-written DIB bytes decode to the right pixel positions") {
    // 2x2 frame, one distinct color per corner:
    //   top-left RED, top-right GREEN, bottom-left BLUE, bottom-right WHITE
    // DIB stores rows bottom-up and samples as BGR, stride 8 (2*3 -> 8).
    val bottomRow = Array[Byte](
      -1, 0, 0, /*BLUE (B=ff)*/ -1, -1, -1, /*WHITE*/ 0, 0 /*pad*/ )
    val topRow = Array[Byte](
      0, 0, -1, /*RED (R=ff)*/ 0, -1, 0, /*GREEN*/ 0, 0 /*pad*/ )
    val dib = bottomRow ++ topRow

    // wrap it in a container authored by makeAviDib, then splice our
    // hand-written frame bytes over its single frame payload
    val px = Array.fill(4)(0)
    val avi = Multimodal.makeAviDib(2, 2, 40000, Seq(px))
    System.arraycopy(dib, 0, avi, avi.length - dib.length, dib.length)

    val Some((w, h, us, frames)) = Multimodal.parseAviDib(avi)
    assert((w, h, us) == (2, 2, 40000) && frames.size == 1)
    assert(frames.head.toSeq ==
      Seq(0xff0000 /*RED*/, 0x00ff00 /*GREEN*/, 0x0000ff /*BLUE*/, 0xffffff))
  }

  test("write->parse round-trip recovers every fixture frame exactly") {
    for (i <- 0 until 3) {
      val (w, h, us, frames) = Multimodal.fixtureAviFrames(i)
      val Some((pw, ph, pus, parsed)) =
        Multimodal.parseAviDib(Multimodal.makeAviDib(w, h, us, frames))
      assert((pw, ph, pus) == (w, h, us))
      assert(parsed.size == frames.size)
      parsed.zip(frames).foreach { case (p, f) => assert(p.sameElements(f)) }
    }
  }

  test("the gate rejects everything that is not an uncompressed-DIB AVI") {
    assert(Multimodal.parseAviDib("no media here".getBytes("UTF-8")).isEmpty)
    // RIFF but WAVE
    assert(Multimodal.parseAviDib(
      Multimodal.makeWav(8000, 1, Array.tabulate(8)(_.toShort))).isEmpty)
    // MP4 (no RIFF at all)
    assert(Multimodal.parseAviDib(Multimodal.makeMp4(600, 1200, 1)).isEmpty)
    // truncated AVI
    val avi = Multimodal.makeAviDib(2, 2, 1000, Seq(Array.fill(4)(0)))
    assert(Multimodal.parseAviDib(avi.take(avi.length - 3)).isEmpty)
  }

  test("distributed decode emits one row per frame with still-image-compatible CRCs") {
    import spark.implicits._
    val rows = Multimodal.decodeVideoFrames(Multimodal.fixtureAviBlobs(spark))
      .collect().sortBy(r => (r.doc_id, r.frame_idx))
    assert(rows.map(_.doc_id).distinct.toSeq == Seq(-53L, -52L, -51L))
    assert(rows.count(_.doc_id == -51L) == 4 && rows.count(_.doc_id == -52L) == 3
      && rows.count(_.doc_id == -53L) == 2)
    // CRC space is shared with stills: recompute from the pattern arrays
    val (w, h, _, frames) = Multimodal.fixtureAviFrames(0)
    val expect = frames.map(Multimodal.pixelCrcInts)
    assert(rows.filter(_.doc_id == -51L).map(_.px_crc).toSeq == expect)
    assert(rows.forall(r => r.width > 0 && r.height > 0))
    // videos 0 and 1 share two frame patterns -> shared fingerprints
    val h0 = rows.filter(_.doc_id == -51L).map(_.px_crc).toSet
    val h1 = rows.filter(_.doc_id == -52L).map(_.px_crc).toSet
    assert((h0 & h1).size == 2)
  }

  test("MJPEG AVI: container walk extracts frames whose pixels equal a direct ImageIO round-trip") {
    val (w, h, us, jpegs) = Multimodal.fixtureMjpgJpegs
    val avi = Multimodal.makeAviMjpg(w, h, us, jpegs)
    val Some((pw, ph, pus, frames)) = Multimodal.parseAviMjpg(avi)
    assert((pw, ph, pus) == (w, h, us))
    assert(frames.size == jpegs.size)
    // pixel-exact vs decoding the SAME jpeg bytes without the container:
    // the container walk must not touch the payload
    frames.zip(jpegs).foreach { case (px, j) =>
      val Some((jw, jh, direct)) = Multimodal.decodeJpegPx(j)
      assert((jw, jh) == (w, h) && px.sameElements(direct))
    }
    // JPEG is lossy (edge ringing spikes single pixels) but the decoded
    // frame must still track the source pattern on average
    val src = Array.tabulate(w * h) { i =>
      Multimodal.patternGray(0, (i % w) % Multimodal.PatternSize,
        (i / w) % Multimodal.PatternSize)
    }
    val meanErr = frames.head.zip(src).map { case (p, g) =>
      math.abs((p & 0xff) - g) }.sum.toDouble / src.length
    assert(meanErr <= 16.0, s"mean channel error $meanErr")
  }

  test("MJPEG gate: DIB AVIs, corrupt JPEG payloads, and non-AVI bytes are rejected or dropped") {
    // a DIB AVI is NOT an MJPG AVI (and vice versa)
    val (w, h, us, frames) = Multimodal.fixtureAviFrames(0)
    assert(Multimodal.parseAviMjpg(Multimodal.makeAviDib(w, h, us, frames)).isEmpty)
    val (mw, mh, mus, jpegs) = Multimodal.fixtureMjpgJpegs
    assert(Multimodal.parseAviDib(Multimodal.makeAviMjpg(mw, mh, mus, jpegs)).isEmpty)
    assert(Multimodal.parseAviMjpg("plain text".getBytes("UTF-8")).isEmpty)
    // corrupt one frame's JPEG entropy bytes: that frame drops, others survive
    val garbled = jpegs.updated(1, jpegs(1).take(4) ++ Array.fill[Byte](16)(0x55))
    val Some((_, _, _, kept)) = Multimodal.parseAviMjpg(
      Multimodal.makeAviMjpg(mw, mh, mus, garbled))
    assert(kept.size == jpegs.size - 1)
  }

  test("distributed MJPEG decode matches the fixture's expected rows") {
    val rows = Multimodal.decodeVideoFrames(Multimodal.fixtureMjpgBlobs(spark))
      .collect().sortBy(_.frame_idx)
      .map(r => (r.doc_id, r.frame_idx, r.width, r.height, r.px_crc))
    assert(rows.toSeq == Multimodal.fixtureMjpgExpected)
  }
}
