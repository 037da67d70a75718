package graft.multimodal.h264

import graft.multimodal.Mp4Samples
import org.scalatest.funsuite.AnyFunSuite

/** Corrupt-stream robustness: a 100 TB crawl contains flipped bits and
  * truncated shards, and the decode contract says corruption surfaces
  * as IllegalArgumentException (UnsupportedFeature included) — never a
  * hang, an unchecked crash (ArrayIndexOutOfBounds, NegativeArraySize,
  * OOM), or silent garbage accepted as success without bounds. Every
  * mutation below is deterministic (seeded), so a failure reproduces. */
class H264FuzzSpec extends AnyFunSuite {

  // CI default is moderate; set GRAFT_FUZZ_N for a heavier sweep
  private val N = sys.env.getOrElse("GRAFT_FUZZ_N", "400").toInt

  /** decode every frame; success or IllegalArgumentException only */
  private def decodeAll(mp4: Array[Byte]): Unit = {
    val t = Mp4Samples.parse(mp4).getOrElse(return )
    val avcc = t.avcc.getOrElse(return )
    val cfg =
      try Decoder.parseAvcc(avcc)
      catch { case _: IllegalArgumentException => return }
    var ref: Decoder.Yuv = null
    var j = 0
    while (j < t.frameCount) {
      try {
        val d = Decoder.decode(t.sample(mp4, j), cfg, ref)
        ref = d
        // decoded planes must be in pixel range (no silent garbage)
        assert(d.y.forall(v => v >= 0 && v <= 255))
      } catch {
        case _: IllegalArgumentException => // typed rejection: fine
      }
      j += 1
    }
  }

  test("single-bit flips anywhere in the container stay typed") {
    val base = H264Fixtures.videoGop(7L, 9)
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < N) {
      val mutated = base.clone()
      val pos = rnd.nextInt(mutated.length)
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      decodeAll(mutated) // must not throw anything but IAE
      i += 1
    }
  }

  test("bit flips inside B-frame samples stay typed") {
    val base = H264Fixtures.videoB(3L, 9)
    val rnd = new scala.util.Random(7)
    var i = 0
    while (i < (N * 3) / 4) {
      val mutated = base.clone()
      val pos = rnd.nextInt(mutated.length)
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      decodeAll(mutated)
      i += 1
    }
  }

  test("truncation at every sample boundary stays typed") {
    val base = H264Fixtures.videoMultiRef(5L, 9)
    val t = Mp4Samples.parse(base).get
    val cfg = Decoder.parseAvcc(t.avcc.get)
    for (f <- 0 until t.frameCount) {
      val full = t.sample(base, f)
      for (cut <- Seq(0, 1, full.length / 2, full.length - 1)) {
        val trunc = java.util.Arrays.copyOfRange(full, 0, cut)
        try {
          Decoder.decode(trunc, cfg)
          ()
        } catch {
          case _: IllegalArgumentException => ()
        }
      }
    }
  }

  /** decode every DISPLAY frame through the PRODUCTION walk
    * (FrameSource.Mp4Frames: sync-seek, DPB + MMCO + long-term state,
    * display→decode mapping); success, IAE, or the seam's typed
    * unsupported-codec signal only */
  private def walkAll(mp4: Array[Byte]): Unit = {
    import graft.pack.FrameSource
    val n =
      try FrameSource.Mp4Frames.frameCount(mp4)
      catch { case _: IllegalArgumentException => return }
    var f = 0
    while (f < n) {
      try {
        FrameSource.Mp4Frames.frame(mp4, f)
        ()
      } catch {
        // typed rejection (incl. the seam's UnsupportedCodecException,
        // an IllegalArgumentException subtype): fine
        case _: IllegalArgumentException => ()
      }
      f += 1
    }
  }

  test("bit flips in MMCO/mod-list/weighted-B streams stay typed through the walk") {
    // the round-9 DPB-protocol features add parse surface (marking
    // ops, modification loops, weight tables) — corrupting them must
    // surface as typed errors in the real walk, never as crashes or
    // wedged DPB state that breaks LATER frames silently
    val bases = Seq(
      H264Fixtures.videoMmco(0L, 10), // op-1 variant
      H264Fixtures.videoMmco(1L, 10), // op-3 long-term variant
      H264Fixtures.videoMmco(2L, 10), // op-5 reset variant
      H264Fixtures.videoModList(3L, 8),
      H264Fixtures.videoWeightedB(4L, 9),
      H264Fixtures.videoImplicitB(5L, 9))
    val rnd = new scala.util.Random(99)
    bases.foreach { base =>
      var i = 0
      while (i < N / 3) {
        val mutated = base.clone()
        val pos = rnd.nextInt(mutated.length)
        mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
        walkAll(mutated)
        i += 1
      }
    }
  }

  test("random bytes as a sample are rejected, not crashed on") {
    val sps = Encoder.spsFor(16, 16)
    val cfg = Decoder.AvcConfig(sps, Encoder.ppsFor(26), 4)
    val rnd = new scala.util.Random(1234)
    var i = 0
    while (i < (N * 3) / 4) {
      val junk = new Array[Byte](4 + rnd.nextInt(60))
      rnd.nextBytes(junk)
      // make the AVCC length prefix self-consistent half the time
      if (i % 2 == 0 && junk.length >= 5) {
        val len = junk.length - 4
        junk(0) = (len >> 24).toByte; junk(1) = (len >> 16).toByte
        junk(2) = (len >> 8).toByte; junk(3) = len.toByte
        junk(4) = (junk(4) & 0x60 | 1).toByte // NAL type 1, refIdc kept
      }
      try {
        Decoder.decode(junk, cfg, Vector(Decoder.Yuv(16, 16, 1, 1,
          new Array[Int](256), new Array[Int](64), new Array[Int](64))))
        ()
      } catch {
        case _: IllegalArgumentException => ()
      }
      i += 1
    }
  }
}
