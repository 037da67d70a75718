package graft.multimodal

import graft.wds.Codecs

/** Generates the committed `src/test/resources/tiny_mjpeg.mp4` fixture:
  * 12 solid-color 8×8 JPEG frames at 5 fps, keyframe every 5th sample.
  * Run once via `sbt "Test/runMain graft.multimodal.Mp4FixtureGen"`;
  * Mp4SamplesSpec decodes the committed bytes (no regeneration at test
  * time, so the spec proves a PRE-EXISTING mp4 decodes).
  */
object Mp4FixtureGen {

  def frameColor(f: Int): (Int, Int, Int) =
    ((f * 20) % 256, (f * 40) % 256, (f * 10 + 100) % 256)

  def build(): Array[Byte] = {
    val frames = (0 until 12).map { f =>
      val (r, g, b) = frameColor(f)
      val px = Array.tabulate(8 * 8 * 3) { i =>
        (i % 3 match { case 0 => r; case 1 => g; case _ => b }).toByte
      }
      Codecs.encodeImage(Codecs.ImageData(8, 8, 3, "RGB", px), "jpg")
    }
    Mp4Samples.encodeFrames(frames, codec = "jpeg", fps = 5,
      width = 8, height = 8, syncEvery = 5)
  }

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get("src/test/resources/tiny_mjpeg.mp4")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, build())
    println(s"wrote $out (${java.nio.file.Files.size(out)} bytes)")
  }
}
