package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** MP3 frame-header audit laws: frame-length arithmetic (incl.
  * padding), ID3v2 syncsafe skip, CBR/VBR detection, resync over
  * garbage, truncation/fuzz tolerance. */
class Mp3ProbeSpec extends AnyFunSuite {

  test("CBR stream: frame count, duration, byte arithmetic") {
    // 10 frames at 128 kbps / 44100 Hz: frameLen = 417 + padding
    val b = Mp3Probe.encodeHeaders(10, _ => 9)
    val m = Mp3Probe.probe(b)
    assert(m.nFrames == 10 && m.sampleRate == 44100)
    assert(m.minBitrateKbps == 128 && m.maxBitrateKbps == 128 && m.cbr)
    // alternating padding: 5 frames of 417 + 5 of 418
    assert(m.totalBytes == 5 * 417 + 5 * 418)
    assert(math.abs(m.durationSec - 10 * 1152.0 / 44100) < 1e-9)
    assert(m.id3v2Bytes == 0)
  }

  test("VBR stream and 48 kHz arithmetic") {
    val b = Mp3Probe.encodeHeaders(6, i => 1 + (i % 14), srIdx = 1)
    val m = Mp3Probe.probe(b)
    assert(m.nFrames == 6 && m.sampleRate == 48000)
    assert(!m.cbr)
    assert(m.minBitrateKbps == 32 && m.maxBitrateKbps == 80)
  }

  test("ID3v2 tag is skipped via syncsafe length") {
    val b = Mp3Probe.encodeHeaders(4, _ => 9, id3Size = 1000)
    val m = Mp3Probe.probe(b)
    assert(m.id3v2Bytes == 1010 && m.nFrames == 4)
    // a tag whose payload CONTAINS a fake sync must not confuse the walk
    val tagged = Mp3Probe.encodeHeaders(4, _ => 9, id3Size = 64)
    tagged(20) = 0xff.toByte
    tagged(21) = 0xfa.toByte
    assert(Mp3Probe.probe(tagged).nFrames == 4)
    // ID3v2.4 footer flag: ten MORE bytes belong to the tag
    val ft = Mp3Probe.encodeHeaders(4, _ => 9, id3Size = 64)
    ft(5) = 0x10.toByte
    val withFooter =
      ft.take(74) ++ new Array[Byte](10) ++ ft.drop(74)
    val mfoot = Mp3Probe.probe(withFooter)
    assert(mfoot.id3v2Bytes == 84 && mfoot.nFrames == 4)
  }

  test("resync over leading garbage; truncation stops cleanly") {
    val clean = Mp3Probe.encodeHeaders(5, _ => 9)
    val withJunk = Array.fill[Byte](37)(0x55) ++ clean
    assert(Mp3Probe.probe(withJunk).nFrames == 5)
    for (cut <- Seq(0, 1, 3, clean.length / 2, clean.length - 1)) {
      val m = Mp3Probe.probe(java.util.Arrays.copyOfRange(clean, 0, cut))
      assert(m.nFrames <= 5) // never crashes, never overcounts
    }
  }

  test("CRC walk: protected frames verify; a planted corruption is " +
      "counted, not decoded around") {
    val good = Mp3Probe.probe(
      Mp3Probe.encodeHeaders(8, _ => 9, withCrc = true))
    assert(good.crcFrames == 8 && good.crcBad == 0)
    val bad = Mp3Probe.probe(
      Mp3Probe.encodeHeaders(8, _ => 9, withCrc = true, corruptCrcAt = 3))
    assert(bad.crcFrames == 8 && bad.crcBad == 1)
    assert(bad.nFrames == 8, "a bad CRC must not derail the walk")
    // CRC-less frames (protection_bit = 1) contribute nothing
    val off = Mp3Probe.probe(Mp3Probe.encodeHeaders(8, _ => 9))
    assert(off.crcFrames == 0 && off.crcBad == 0)
  }

  test("Xing/Info header: declared totals parsed; declared-vs-walked " +
      "consistency flags truncation") {
    val ok = Mp3Probe.probe(Mp3Probe.encodeHeaders(12, _ => 9,
      withCrc = true, xingTag = "Xing"))
    assert(ok.xingTag == "Xing")
    assert(ok.declaredFrames == 12 && ok.declaredBytes == ok.totalBytes)
    assert(ok.declaredConsistent)
    // a truncated file: declared totals exceed the walk
    val full = Mp3Probe.encodeHeaders(12, _ => 9, xingTag = "Info")
    val trunc = Mp3Probe.probe(
      java.util.Arrays.copyOfRange(full, 0, full.length - 500))
    assert(trunc.xingTag == "Info" && trunc.declaredFrames == 12)
    assert(trunc.nFrames < 12 && !trunc.declaredConsistent)
    // the LAME convention: declared frames EXCLUDE the tag frame
    // itself — an intact file declaring n-1 must pass
    val lame = Mp3Probe.probe(Mp3Probe.encodeHeaders(12, _ => 9,
      xingTag = "Xing", declaredFrames = 11))
    assert(lame.declaredFrames == 11 && lame.declaredConsistent)
    // declared-frames LIE outside both spellings (the mm33 fixture)
    val lie = Mp3Probe.probe(Mp3Probe.encodeHeaders(12, _ => 9,
      xingTag = "Info", declaredFrames = 10))
    assert(lie.declaredFrames == 10 && !lie.declaredConsistent)
    // no tag: absent fields, vacuously consistent
    val plain = Mp3Probe.probe(Mp3Probe.encodeHeaders(4, _ => 9))
    assert(plain.xingTag == "" && plain.declaredFrames == -1 &&
      plain.declaredConsistent)
  }

  test("seeded fuzz: bit flips never crash or hang") {
    val base = Mp3Probe.encodeHeaders(8, i => 1 + (i % 14))
    val rnd = new scala.util.Random(11)
    var i = 0
    while (i < 500) {
      val m = base.clone()
      val pos = rnd.nextInt(m.length)
      m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
      val r = Mp3Probe.probe(m)
      assert(r.nFrames >= 0 && r.totalBytes <= m.length.toLong + 8)
      i += 1
    }
  }
}
