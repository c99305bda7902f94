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
}
