package graft.pack

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.h264.H264Fixtures
import graft.multimodal.Mp4Samples
import graft.wds.Codecs

/** The [[FrameSource.frameImage]] law: bit-identical pixels to
  * `decodeImage(frame(...))` on every codec path — the fast path may
  * skip the PNG round-trip, never change a value. */
class FrameImageSpec extends AnyFunSuite {

  private def assertLaw(src: FrameSource, video: Array[Byte],
      n: Int): Unit =
    (0 until n).foreach { f =>
      val slow = Codecs.decodeImage(src.frame(video, f))
      val fast = src.frameImage(video, f)
      assert(fast.width == slow.width && fast.height == slow.height &&
        fast.nChannels == slow.nChannels, s"frame $f geometry")
      assert(fast.data.sameElements(slow.data), s"frame $f pixels")
    }

  test("avc1: frameImage equals the PNG round-trip, incl. GOP walks") {
    for (d <- Seq(0L, 5L, 13L)) {
      assertLaw(FrameSource.Mp4Frames, H264Fixtures.video(d, 5), 5)
      assertLaw(FrameSource.Mp4Frames, H264Fixtures.videoGop(d, 8), 8)
    }
  }

  test("still-image samples: frameImage equals the stored-sample decode") {
    val frames = (0 until 4).map { f =>
      val px = Array.tabulate(12)(i => ((f * 53 + i * 7) % 251).toByte)
      Codecs.encodeImage(Codecs.ImageData(2, 2, 3, "RGB", px), "png")
    }
    val mp4 = Mp4Samples.encodeFrames(frames, codec = "png ", fps = 5,
      width = 2, height = 2, syncEvery = 2)
    assertLaw(FrameSource.Mp4Frames, mp4, 4)
  }

  test("default implementation path (Synthetic) satisfies the law") {
    assertLaw(FrameSource.Synthetic, "vid".getBytes("UTF-8"), 2)
  }
}
