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

  test("rejects non-PCM and truncated streams") {
    assertThrows[IllegalArgumentException](
      WavCodec.decode("nope".getBytes ++ new Array[Byte](40)))
    val w = WavCodec.encode(WavCodec.Wav(8000, 1, sine(8000, 100, 80)))
    w(20) = 3 // audio format = IEEE float
    assertThrows[IllegalArgumentException](WavCodec.decode(w))
  }
}
