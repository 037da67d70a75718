package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ADTS frame-walk audit laws: header-field round-trip, frame-length
  * arithmetic, raw-data-block duration, resync accounting (every junk
  * byte counted, never silently skipped), truncation detection,
  * config-change detection, fuzz tolerance. */
class AacProbeSpec extends AnyFunSuite {

  test("clean CBR-ish stream: fields, frame count, duration") {
    // 10 frames, 48 kHz stereo LC, protected (9-byte headers)
    val b = AacProbe.encodeAdts(10, _ => 200, srIdx = 3, channels = 2,
      profile = 1, withCrc = true)
    val m = AacProbe.probe(b)
    assert(m.nFrames == 10 && m.protectedFrames == 10)
    assert(m.sampleRate == 48000 && m.channels == 2 && m.profile == 1)
    assert(m.mpegVersion == 0 && m.rawBlocks == 10)
    assert(m.junkBytes == 0 && m.resyncs == 0 && m.truncatedBytes == 0)
    assert(math.abs(m.durationSec - 10 * 1024.0 / 48000) < 1e-9)
    assert(b.length == 10 * (9 + 200))
  }

  test("unprotected frames and multiple raw data blocks per frame") {
    // rawBlocks field = 2 → 3 blocks/frame; 7-byte headers
    val b = AacProbe.encodeAdts(6, i => 150 + i, srIdx = 4,
      channels = 1, profile = 0, withCrc = false, rawBlocks = 2)
    val m = AacProbe.probe(b)
    assert(m.nFrames == 6 && m.protectedFrames == 0)
    assert(m.sampleRate == 44100 && m.rawBlocks == 18)
    assert(math.abs(m.durationSec - 18 * 1024.0 / 44100) < 1e-9)
  }

  test("syncword corruption: the walker resyncs and accounts every " +
      "junk byte of the corrupt frame") {
    val b = AacProbe.encodeAdts(8, i => 100 + i, srIdx = 5,
      channels = 2, profile = 1, withCrc = false, breakSyncAt = 3)
    val m = AacProbe.probe(b)
    assert(m.nFrames == 7, "exactly the corrupt frame is lost")
    assert(m.junkBytes == 7 + 100 + 3, "the whole corrupt frame is junk")
    assert(m.resyncs == 1 && m.truncatedBytes == 0)
  }

  test("truncated final frame: reported as tail bytes, not a frame") {
    val b = AacProbe.encodeAdts(5, _ => 120, srIdx = 3, channels = 1,
      profile = 1, withCrc = true, truncateTail = 3)
    val m = AacProbe.probe(b)
    assert(m.nFrames == 4 && m.truncatedBytes == 9 + 120 - 3)
    assert(m.junkBytes == 0 && m.rawBlocks == 4)
    // a cut INSIDE the final header leaves a sub-header fragment: junk
    val cut = java.util.Arrays.copyOfRange(b, 0, 4 * 129 + 5)
    val m2 = AacProbe.probe(cut)
    assert(m2.nFrames == 4 && m2.truncatedBytes == 0 && m2.junkBytes == 5)
  }

  test("corruption and truncation together (the mm34 %77 shape)") {
    val b = AacProbe.encodeAdts(16, _ => 100, srIdx = 3, channels = 2,
      profile = 2, withCrc = false, breakSyncAt = 0, truncateTail = 3)
    val m = AacProbe.probe(b)
    assert(m.nFrames == 14 && m.resyncs == 1)
    assert(m.junkBytes == 107 && m.truncatedBytes == 104)
  }

  test("mid-stream parameter change is counted, not silently merged") {
    val a = AacProbe.encodeAdts(4, _ => 100, srIdx = 3, channels = 2,
      profile = 1, withCrc = false)
    val c = AacProbe.encodeAdts(3, _ => 100, srIdx = 4, channels = 1,
      profile = 1, withCrc = false)
    val m = AacProbe.probe(a ++ c)
    assert(m.nFrames == 7 && m.configChanges == 3)
    assert(m.sampleRate == 48000 && m.channels == 2, "first frame wins")
  }

  test("ID3v2 tag is skipped via syncsafe length, not counted as junk") {
    val clean = AacProbe.encodeAdts(4, _ => 100, srIdx = 3,
      channels = 2, profile = 1, withCrc = false)
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0) ++
      Array[Byte]((1000 >> 21).toByte, ((1000 >> 14) & 0x7f).toByte,
        ((1000 >> 7) & 0x7f).toByte, (1000 & 0x7f).toByte) ++
      new Array[Byte](1000)
    val m = AacProbe.probe(tag ++ clean)
    assert(m.nFrames == 4 && m.junkBytes == 0 && m.resyncs == 0)
    // a tag whose PAYLOAD contains a fake sync must not confuse the walk
    val evil = tag.clone()
    evil(20) = 0xff.toByte
    evil(21) = 0xf1.toByte
    assert(AacProbe.probe(evil ++ clean).nFrames == 4)
    // a tag length overrunning the file is safe (0 frames, no crash)
    assert(AacProbe.probe(tag.take(40)).nFrames == 0)
    // ID3v2.4 footer flag (0x10): ten MORE bytes to skip, still 0 junk
    val ftag = tag.clone()
    ftag(5) = 0x10.toByte
    val mf = AacProbe.probe(ftag ++ new Array[Byte](10) ++ clean)
    assert(mf.nFrames == 4 && mf.junkBytes == 0 && mf.resyncs == 0,
      s"footer must be skipped as tag bytes: $mf")
  }

  test("leading garbage resyncs once; empty and tiny inputs are safe") {
    val clean = AacProbe.encodeAdts(5, _ => 100, srIdx = 3,
      channels = 1, profile = 1, withCrc = true)
    val m = AacProbe.probe(Array.fill[Byte](23)(0x44) ++ clean)
    assert(m.nFrames == 5 && m.junkBytes == 23 && m.resyncs == 1)
    assert(AacProbe.probe(Array.emptyByteArray).nFrames == 0)
    assert(AacProbe.probe(Array[Byte](0xff.toByte, 0xf1.toByte))
      .nFrames == 0)
  }

  test("empty stream: encodeAdts(0) is legal with the default " +
      "breakSyncAt and probes to all-zero stats") {
    val b = AacProbe.encodeAdts(0, _ => 100, srIdx = 3, channels = 2,
      profile = 1, withCrc = true)
    assert(b.isEmpty)
    val m = AacProbe.probe(b)
    assert(m.nFrames == 0 && m.junkBytes == 0 && m.truncatedBytes == 0)
  }

  test("seeded fuzz: bit flips never crash, hang, or overcount") {
    val base = AacProbe.encodeAdts(8, i => 100 + 7 * i, srIdx = 4,
      channels = 2, profile = 1, withCrc = true)
    val rnd = new scala.util.Random(13)
    var i = 0
    while (i < 500) {
      val m = base.clone()
      val pos = rnd.nextInt(m.length)
      m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
      val r = AacProbe.probe(m)
      assert(r.nFrames >= 0 && r.nFrames <= 9)
      assert(r.junkBytes + r.truncatedBytes <= m.length)
      i += 1
    }
  }
}
