package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Ogg/Opus probe laws: page/packet accounting, OpusHead fields,
  * 48 kHz granule duration minus pre-skip, resync over garbage,
  * truncation/fuzz tolerance. */
class OggProbeSpec extends AnyFunSuite {

  test("Opus-in-Ogg: codec id, channels, pre-skip, duration") {
    val b = OggProbe.encodeMinimalOpus(channels = 2, preSkip = 312,
      inputRate = 48000, nAudio = 10)
    val m = OggProbe.probe(b)
    assert(m.codec == "opus" && m.channels == 2 && m.preSkip == 312)
    assert(m.sampleRate == 48000)
    assert(m.nPages == 12 && m.nPackets == 12)
    assert(m.lastGranule == 312L + 10 * 960)
    assert(math.abs(m.durationSec - 10 * 960 / 48000.0) < 1e-9)
    assert(m.crcBad == 0, "encoder CRCs must verify clean")
  }

  test("page CRC: every clean page verifies; a planted corruption and " +
      "a payload bitflip are counted, not walked around") {
    val clean = OggProbe.probe(OggProbe.encodeMinimalOpus(1, 100, 48000, 8))
    assert(clean.nPages == 10 && clean.crcBad == 0)
    // stored-CRC corruption on page seq 5 (an audio page)
    val bad = OggProbe.probe(
      OggProbe.encodeMinimalOpus(1, 100, 48000, 8, corruptCrcAt = 5))
    assert(bad.crcBad == 1, s"planted corrupt CRC must be counted: $bad")
    assert(bad.nPages == 10 && bad.lastGranule == clean.lastGranule,
      "a bad CRC must not derail the walk")
    // a PAYLOAD flip (CRC field intact) must also mismatch
    val enc = OggProbe.encodeMinimalOpus(1, 100, 48000, 8)
    enc(enc.length - 3) = (enc(enc.length - 3) ^ 0x40).toByte
    assert(OggProbe.probe(enc).crcBad == 1)
    // RFC 3533 CRC parameters: direct, poly 0x04c11db7, init 0 — the
    // table's first non-trivial entry IS the polynomial
    assert(OggProbe.pageCrc(Array[Byte](0, 0, 0, 1), 0, 4, 22) ==
      0x04c11db7)
  }

  test("resync over leading garbage; truncation stays clean") {
    val clean = OggProbe.encodeMinimalOpus(1, 0, 16000, 4)
    val junked = Array.fill[Byte](23)(0x4f) ++ clean
    val m = OggProbe.probe(junked)
    assert(m.codec == "opus" && m.nPages == 6)
    for (cut <- 0 until clean.length by 5) {
      val t = OggProbe.probe(java.util.Arrays.copyOfRange(clean, 0, cut))
      assert(t.nPages <= 6)
    }
  }

  test("vorbis identification header parses") {
    // hand-build a single BOS page with a vorbis id header
    val id = java.nio.ByteBuffer.allocate(30)
    id.put(1.toByte); id.put("vorbis".getBytes("US-ASCII"))
    id.putInt(0) // version (LE zero either way)
    id.put(2.toByte) // channels
    id.put((44100 & 0xff).toByte); id.put(((44100 >> 8) & 0xff).toByte)
    id.put(((44100 >> 16) & 0xff).toByte); id.put(0.toByte)
    id.put(new Array[Byte](30 - id.position()))
    val page = java.nio.ByteBuffer.allocate(27 + 1 + 30)
    page.put("OggS".getBytes("US-ASCII")); page.put(0.toByte)
    page.put(0x02.toByte)
    page.put(new Array[Byte](8)) // granule 0
    page.put(new Array[Byte](12)) // serial/seq/crc
    page.put(1.toByte); page.put(30.toByte)
    page.put(id.array())
    val m = OggProbe.probe(page.array())
    assert(m.codec == "vorbis" && m.channels == 2 && m.sampleRate == 44100)
  }

  test("seeded fuzz: flips never crash, counts stay bounded") {
    val base = OggProbe.encodeMinimalOpus(2, 100, 48000, 8)
    val rnd = new scala.util.Random(17)
    var i = 0
    while (i < 600) {
      val m = base.clone()
      val pos = rnd.nextInt(m.length)
      m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
      val r = OggProbe.probe(m)
      assert(r.nPages <= 10 && r.nPackets <= m.length)
      i += 1
    }
  }
}
