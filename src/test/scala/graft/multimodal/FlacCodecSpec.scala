package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec laws. The big one is losslessness: decode∘encode is the
  * identity for every channel mode, block size, bit depth, and
  * waveform — FLAC's defining property, and what makes decoded-sample
  * oracles exact. Plus CRC vectors, stereo decorrelation round trips,
  * tiny/ragged block edges, and corrupt-stream fuzz (typed rejection
  * only). */
class FlacCodecSpec extends AnyFunSuite {

  private def wave(n: Int, ch: Int, seed: Int,
      bits: Int = 16): FlacCodec.Flac = {
    val rnd = new scala.util.Random(seed)
    val lim = 1 << (bits - 1)
    FlacCodec.Flac(16000, ch, bits, Array.tabulate(n * ch) { i =>
      val t = i / ch
      val base = ((t * (seed % 13 + 3)) % lim) - lim / 2
      math.max(-lim, math.min(lim - 1, base + rnd.nextInt(31) - 15))
    })
  }

  test("decode∘encode is the identity (mono, stereo, block sizes)") {
    for {
      (n, ch) <- Seq((100, 1), (4096, 1), (5000, 2), (16, 1), (8191, 2))
      bs <- Seq(4096, 256)
    } {
      val f = wave(n, ch, seed = n + ch + bs)
      val enc = FlacCodec.encode(f, blockSize = bs)
      val dec = FlacCodec.decode(enc)
      assert(dec.sampleRate == 16000 && dec.channels == ch &&
        dec.bitsPerSample == 16)
      assert(dec.samples.toSeq == f.samples.toSeq, s"n=$n ch=$ch bs=$bs")
    }
  }

  test("all four channel modes round-trip exactly") {
    val f = wave(3000, 2, seed = 9)
    for (mode <- Seq(FlacCodec.Independent, FlacCodec.LeftSide,
      FlacCodec.RightSide, FlacCodec.MidSide)) {
      val dec = FlacCodec.decode(FlacCodec.encode(f, 1024, mode))
      assert(dec.samples.toSeq == f.samples.toSeq, s"mode=$mode")
    }
  }

  test("extreme samples and other bit depths survive") {
    val lim = 1 << 15
    val spikes = FlacCodec.Flac(8000, 2, 16, Array.tabulate(600) { i =>
      if (i % 7 == 0) lim - 1 else if (i % 11 == 0) -lim else i % 97 - 48
    })
    for (mode <- Seq(FlacCodec.Independent, FlacCodec.MidSide)) {
      assert(FlacCodec.decode(FlacCodec.encode(spikes, 128, mode))
        .samples.toSeq == spikes.samples.toSeq)
    }
    val f8 = wave(500, 1, seed = 4, bits = 8)
    assert(FlacCodec.decode(FlacCodec.encode(f8)).samples.toSeq ==
      f8.samples.toSeq)
    val f24 = wave(500, 2, seed = 5, bits = 24)
    assert(FlacCodec.decode(FlacCodec.encode(f24, 256,
      FlacCodec.LeftSide)).samples.toSeq == f24.samples.toSeq)
  }

  test("CRC-8/CRC-16 vectors (spec polynomials 0x07 / 0x8005)") {
    // CRC-8 poly 0x07 of "123456789" is the standard check value 0xF4
    val msg = "123456789".getBytes("US-ASCII")
    assert(FlacCodec.crc8(msg, 0, msg.length) == 0xf4)
    // CRC-16/BUYPASS (poly 0x8005, init 0, no reflect) check is 0xFEE8
    assert(FlacCodec.crc16(msg, 0, msg.length) == 0xfee8)
    // a flipped header byte must be rejected via CRC-8
    val enc = FlacCodec.encode(wave(300, 1, seed = 3))
    val firstFrame = 4 + 4 + 34 // magic + block header + STREAMINFO
    val bad = enc.clone()
    bad(firstFrame + 2) = (bad(firstFrame + 2) ^ 0x04).toByte
    intercept[IllegalArgumentException](FlacCodec.decode(bad))
  }

  test("degenerate blocks: constant fill and short-block warmup") {
    val const = FlacCodec.Flac(8000, 1, 16, Array.fill(64)(1234))
    assert(FlacCodec.decode(FlacCodec.encode(const, 64)).samples
      .forall(_ == 1234))
    val tiny = FlacCodec.Flac(8000, 1, 16, Array(-7, 7, 9, -9,
      100, -100, 31, -31, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14))
    assert(FlacCodec.decode(FlacCodec.encode(tiny, 16)).samples.toSeq ==
      tiny.samples.toSeq)
  }

  test("hand-rolled LPC + escape partition + wasted bits decode exactly") {
    // a single 8-sample frame written bit by bit: LPC order 1
    // (coef 1, shift 0 -> pred = previous), ONE wasted bit (all
    // outputs even), residuals in TWO partitions — partition 0 Rice
    // param 2, partition 1 the 0b1111 ESCAPE with 5-bit raw values
    final class W {
      private val out = new java.io.ByteArrayOutputStream()
      private var cur = 0
      private var n = 0
      def b(v: Int): Unit = {
        cur = (cur << 1) | (v & 1); n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
      }
      def u(bits: Int, v: Int): Unit = {
        var i = bits - 1
        while (i >= 0) { b((v >> i) & 1); i -= 1 }
      }
      def s(bits: Int, v: Int): Unit = u(bits, v & ((1 << bits) - 1))
      def align(): Unit = while (n != 0) b(0)
      def bytes: Array[Byte] = out.toByteArray
    }
    val w = new W
    w.u(8, 'f'); w.u(8, 'L'); w.u(8, 'a'); w.u(8, 'C')
    // STREAMINFO (last metadata block)
    w.b(1); w.u(7, 0); w.u(24, 34)
    w.u(16, 8); w.u(16, 8); w.u(24, 0); w.u(24, 0)
    w.u(20, 8000); w.u(3, 0); w.u(5, 15) // 1 ch, 16 bps
    w.u(4, 0); w.u(32, 8) // total samples = 8 (36 bits)
    (0 until 16).foreach(_ => w.u(8, 0)) // md5
    val headStart = w.bytes.length // frame starts here (aligned)
    w.u(14, 0x3ffe); w.b(0); w.b(0)
    w.u(4, 6) // block size: u8 follows
    w.u(4, 0) // rate: streaminfo
    w.u(4, 0) // 1 channel
    w.u(3, 4) // 16 bps
    w.b(0)
    w.u(8, 0) // frame number 0
    w.u(8, 7) // block size - 1
    val headerSoFar = w.bytes
    w.u(8, FlacCodec.crc8(headerSoFar, headStart, headerSoFar.length))
    // subframe: LPC order 1 (type 32), wasted-bits flag + unary "1"
    w.b(0); w.u(6, 32); w.b(1); w.b(1) // wasted count = 1
    w.s(15, 100) // warmup (15 effective bits)
    w.u(4, 3) // precision-1 -> 4 bits
    w.s(5, 0) // shift 0
    w.s(4, 1) // coefficient 1 -> pred = x[i-1]
    w.u(2, 0) // 4-bit Rice params
    w.u(4, 1) // partition order 1 -> 2 partitions
    // partition 0 (3 residuals: 3, -2, 0), Rice param 2
    w.u(4, 2)
    w.b(0); w.b(1); w.u(2, 2) // zz(3)=6: q=1, rem=2
    w.b(1); w.u(2, 3) // zz(-2)=3: q=0, rem=3
    w.b(1); w.u(2, 0) // zz(0)=0
    // partition 1 (4 residuals: -5, 15, -16, 1), ESCAPE raw 5 bits
    w.u(4, 15); w.u(5, 5)
    w.s(5, -5); w.s(5, 15); w.s(5, -16); w.s(5, 1)
    w.align()
    val body = w.bytes
    w.u(16, FlacCodec.crc16(body, headStart, body.length))
    val dec = FlacCodec.decode(w.bytes)
    // coded chain: 100, +3, -2, 0, -5, +15, -16, +1 -> each output ×2
    val coded = Seq(100, 103, 101, 101, 96, 111, 95, 96)
    assert(dec.samples.toSeq == coded.map(_ * 2))
  }

  test("MediaColumns audio ops sniff FLAC and match the WAV path") {
    // identical samples as WAV and as FLAC must produce identical
    // features through the container-agnostic decodeAudio dispatch
    val f = wave(2500, 2, seed = 12)
    val asWav = WavCodec.encode(WavCodec.Wav(16000, 2,
      f.samples.map(_.toShort)))
    val asFlac = FlacCodec.encode(f, 512, FlacCodec.LeftSide)
    val w1 = MediaColumns.decodeAudio(asWav)
    val w2 = MediaColumns.decodeAudio(asFlac)
    assert(w1.sampleRate == w2.sampleRate && w1.channels == w2.channels)
    assert(w1.samples.toSeq == w2.samples.toSeq)
    // 24-bit FLAC normalizes to 16-bit by arithmetic shift
    val f24 = FlacCodec.Flac(8000, 1, 24, Array(1 << 20, -(1 << 20), 256))
    val w24 = MediaColumns.decodeAudio(FlacCodec.encode(f24, 16))
    assert(w24.samples.toSeq == Seq((1 << 12).toShort,
      (-(1 << 12)).toShort, 1.toShort))
  }

  test("corrupt streams reject typed, never crash (seeded fuzz)") {
    val base = FlacCodec.encode(wave(2000, 2, seed = 21), 512,
      FlacCodec.MidSide)
    val rnd = new scala.util.Random(77)
    var i = 0
    while (i < 600) {
      val mutated = base.clone()
      val pos = rnd.nextInt(mutated.length)
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val d = FlacCodec.decode(mutated)
        assert(d.samples.length <= 2000 * 2 + 65536) // no blowup
      } catch {
        case _: IllegalArgumentException => ()
      }
      i += 1
    }
    // truncation at every boundary class
    for (cut <- Seq(0, 3, 4, 20, 41, 42, base.length / 2, base.length - 1)) {
      try {
        FlacCodec.decode(java.util.Arrays.copyOfRange(base, 0, cut))
        ()
      } catch { case _: IllegalArgumentException => () }
    }
  }
}
