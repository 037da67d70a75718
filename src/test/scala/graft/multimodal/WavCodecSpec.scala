package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class WavCodecSpec extends AnyFunSuite {

  private def sine(sr: Int, freq: Double, n: Int, amp: Double = 12000.0) =
    Array.tabulate(n)(i =>
      (amp * StrictMath.sin(2.0 * StrictMath.PI * freq * i / sr)).toShort)

  test("encode/decode round-trips samples, rate, channels") {
    val w = WavCodec.Wav(8000, 2, sine(8000, 440, 1600))
    val back = WavCodec.decode(WavCodec.encode(w))
    assert(back.sampleRate == 8000)
    assert(back.channels == 2)
    assert(back.samples.toSeq == w.samples.toSeq)
    assert(back.frames == 800)
    assert(back.durationSec == 0.1)
  }

  test("decoder skips unknown chunks and fmt extensions") {
    val w = WavCodec.Wav(16000, 1, sine(16000, 220, 160))
    val base = WavCodec.encode(w)
    // splice a LIST chunk between fmt and data (odd length → padded)
    val fmtEnd = 12 + 8 + 16
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++
      Array[Byte](0)
    val spliced = base.take(fmtEnd) ++ junk ++ base.drop(fmtEnd)
    // fix riff size
    val riffLen = spliced.length - 8
    val fixed = spliced.clone()
    fixed(4) = (riffLen & 0xff).toByte
    fixed(5) = ((riffLen >> 8) & 0xff).toByte
    fixed(6) = ((riffLen >> 16) & 0xff).toByte
    fixed(7) = ((riffLen >> 24) & 0xff).toByte
    val back = WavCodec.decode(fixed)
    assert(back.samples.toSeq == w.samples.toSeq)
  }

  test("rms of a full-cycle sine ~= amp/sqrt(2); peak <= amp") {
    val amp = 12000.0
    val w = WavCodec.Wav(8000, 1, sine(8000, 400, 8000, amp))
    val r = WavCodec.rms(w)
    assert(math.abs(r - amp / math.sqrt(2)) / (amp / math.sqrt(2)) < 0.01, r)
    assert(WavCodec.peak(w) <= amp.toInt)
    assert(WavCodec.peak(w) > amp.toInt * 9 / 10)
  }

  test("resampleLinear: identity at same rate; length law; endpoints") {
    val w = WavCodec.Wav(8000, 1, sine(8000, 300, 4001))
    assert(WavCodec.resampleLinear(w, 8000).samples.toSeq
      == w.samples.toSeq)
    val up = WavCodec.resampleLinear(w, 12000)
    assert(up.sampleRate == 12000)
    assert(up.samples.length == 4000L * 12000 / 8000 + 1)
    // exact source positions are preserved verbatim (rem == 0 every
    // 3rd output at a 2:3 ratio)
    (0 until up.samples.length by 3).foreach { j =>
      assert(up.samples(j) == w.samples(j * 2 / 3))
    }
    assert(up.samples(0) == w.samples(0))
  }

  test("resampleLinear: interpolated values sit between neighbors") {
    val w = WavCodec.Wav(8000, 1, sine(8000, 700, 2000))
    val up = WavCodec.resampleLinear(w, 12000)
    (0 until up.samples.length).foreach { j =>
      val idx = (j.toLong * 8000 / 12000).toInt
      if (idx + 1 < w.samples.length) {
        val lo = math.min(w.samples(idx), w.samples(idx + 1))
        val hi = math.max(w.samples(idx), w.samples(idx + 1))
        assert(up.samples(j) >= lo && up.samples(j) <= hi, s"j=$j")
      }
    }
  }

  test("resampleLinear: downsample then inspect rate and bounds") {
    val w = WavCodec.Wav(12000, 1, sine(12000, 500, 6001))
    val down = WavCodec.resampleLinear(w, 8000)
    assert(down.sampleRate == 8000)
    assert(down.samples.length == 6000L * 8000 / 12000 + 1)
    assert(WavCodec.peak(down) <= WavCodec.peak(w))
    assertThrows[IllegalArgumentException](
      WavCodec.resampleLinear(WavCodec.Wav(8000, 2, new Array[Short](4)),
        12000))
  }

  test("rejects non-PCM and truncated streams") {
    assertThrows[IllegalArgumentException](
      WavCodec.decode("nope".getBytes ++ new Array[Byte](40)))
    val w = WavCodec.encode(WavCodec.Wav(8000, 1, sine(8000, 100, 80)))
    w(20) = 3 // audio format = IEEE float
    assertThrows[IllegalArgumentException](WavCodec.decode(w))
  }
}
