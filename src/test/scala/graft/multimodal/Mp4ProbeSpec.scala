package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class Mp4ProbeSpec extends AnyFunSuite {

  test("probes mvhd timescale/duration and tkhd dimensions") {
    val mp4 = Mp4Probe.encodeMinimal(
      timescale = 90000, duration = 450000, width = 1280, height = 720)
    val m = Mp4Probe.probe(mp4)
    assert(m.timescale == 90000)
    assert(m.duration == 450000)
    assert(m.durationSec == 5.0)
    assert(m.width == 1280 && m.height == 720)
    assert(m.nTracks == 1)
  }

  test("skips unknown boxes (free/mdat) and tolerates truncated tails") {
    val base = Mp4Probe.encodeMinimal(1000, 2500, 640, 480)
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length)
      b.put(name.getBytes("US-ASCII"))
      b.put(payload)
      b.array()
    }
    // free box before moov, mdat after (typical layout)
    val ftypLen = 20 // 8 + 12 payload from encodeMinimal
    val withJunk = base.take(ftypLen) ++
      box("free", new Array[Byte](13)) ++
      base.drop(ftypLen) ++
      box("mdat", Array.fill[Byte](99)(7))
    val m = Mp4Probe.probe(withJunk)
    assert(m.durationSec == 2.5)
    assert(m.width == 640 && m.height == 480)
    // truncated mid-mdat still probes (moov already seen)
    val trunc = Mp4Probe.probe(withJunk.dropRight(50))
    assert(trunc.timescale == 1000)
  }

  test("FrameSource.Mp4Meta derives frame geometry from the container") {
    val mp4 = Mp4Probe.encodeMinimal(1000, 4000, 320, 240) // 4 s
    val fs = graft.pack.FrameSource.Mp4Meta(fpsValue = 25.0)
    assert(fs.frameCount(mp4) == 100)
    val centers = graft.pack.Frames.segmentCenters(
      4, fs.fps(mp4), fs.frameCount(mp4) - 1,
      bound = Some((0.0, fs.frameCount(mp4) / fs.fps(mp4))))
    assert(centers.length == 4)
    assert(centers.forall(i => i >= 0 && i < 100))
  }

  test("rejects non-MP4 bytes") {
    assertThrows[IllegalArgumentException](
      Mp4Probe.probe("clearly not an mp4 file at all".getBytes))
  }
}
