package graft.pack

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of buildSample for every sampler type (gate queries
  * cover the end-to-end tar path; this isolates the per-type shapes). */
class PackStageSpec extends AnyFunSuite {

  private val media: String => Array[Byte] = _.getBytes(UTF_8)
  private def opts(t: PackStage.SamplerType) =
    PackStage.PackOptions(samplerType = t, numSegments = 2,
      frames = FrameSource.Fixed(count = 50))
  private def json(s: graft.wds.Sample): String =
    new String(s.entries("json"), UTF_8)

  import PackStage.SamplerType._

  test("dispatch table covers all ten reference types; unknown rejected") {
    assert(PackStage.SamplerType.all.map(_.name).toSet == Set(
      "un", "kf", "video-only", "video_text_pair", "video_interleave",
      "video_sft", "merlin-s", "image", "merlin-un", "unicontrol"))
    assert(PackStage.SamplerType.byName("KF") == Kf)
    assertThrows[IllegalArgumentException](
      PackStage.SamplerType.byName("nope"))
  }

  test("un: segment-center frames + prompt/txt/conversations json") {
    val s = PackStage.buildSample(7, Seq("v.mp4"), "cap", opts(Uniform), media)
    assert(s.key == "000000007")
    assert(s.entries.keySet == Set("json", "0.jpg", "1.jpg"))
    assert(json(s).contains("\"prompt\":\"<image><image>\""))
    assert(json(s).contains("\"txt\":\"cap\""))
  }

  test("kf: I/P combine with scaled-timestamp prompt") {
    val s = PackStage.buildSample(1, Seq("v.mp4"), "cap", opts(Kf), media)
    // Fixed(50): 6 I-frames (5 keyframes + last) + 18 P-fills = 24
    assert(s.entries.size == 25)
    val j = json(s)
    assert("<Iimage>#".r.findAllIn(j).size == 6)
    assert("<Pimage>#".r.findAllIn(j).size == 18)
    assert(j.contains("\"image_name_list\":[\"000000001-0\""))
  }

  test("video-only and pair write single-mp4 samples") {
    val vo = PackStage.buildSample(2, Seq("v.mp4"), "cap", opts(VideoOnly), media)
    assert(vo.entries.keySet == Set("json", "mp4"))
    assert(json(vo).contains("\"video_id\":\"000000002\""))
    val pr = PackStage.buildSample(3, Seq("v.mp4"), "cap", opts(Pair), media)
    assert(json(pr).contains("\"videos\":[\"000000003\"]"))
  }

  test("interleave: multi-clip sibling entries with <video> per clip") {
    val s = PackStage.buildSample(4, Seq("a.mp4", "b.mp4"), "cap",
      opts(Interleave), media)
    assert(s.entries.keySet == Set("json", "0.mp4", "1.mp4"))
    assert(json(s).contains("<video><video>"))
  }

  test("sft: QA list becomes videochat2 turns, <video> on first question") {
    val s = PackStage.buildSample(5, Seq("v.mp4"),
      """[{"q":"what?","a":"that."}]""", opts(Sft), media)
    val j = json(s)
    assert(j.contains("\"value\":\"what?<video>\""))
    assert(j.contains("\"value\":\"that.\""))
  }

  test("merlin-s: black-background synth + QA transcript split") {
    val s = PackStage.buildSample(6,
      Seq("Black background: 4, 3", "img.jpg"),
      "<image>#5# ans Summary: end", opts(MerlinS), media)
    assert(s.entries.keySet == Set("json", "0.jpg", "1.jpg"))
    val j = json(s)
    assert(j.contains("Summary this video."))
    // black background rendered to a real PNG, not path bytes
    assert(s.entries("0.jpg").take(4).toSeq ==
      Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
  }

  test("image: single jpg under the sample's own key") {
    val s = PackStage.buildSample(8, Seq("i.jpg"),
      """[{"q":"desc","a":"a cat"}]""", opts(Image), media)
    assert(s.entries.keySet == Set("json", "jpg"))
    assert(json(s).contains("\"value\":\"desc<image>\""))
    assert(json(s).contains("\"image\":[\"000000008\"]"))
  }

  test("merlin-un: even-human prompts / odd-gpt txts split") {
    val s = PackStage.buildSample(9, Seq("a.jpg", "b.jpg"),
      """[{"from":"human","value":"q1"},{"from":"gpt","value":"a1"}]""",
      opts(MerlinUn), media)
    val j = json(s)
    assert(j.contains("\"prompt\":[\"q1\"]"))
    assert(j.contains("\"txt\":[\"a1\"]"))
    assert(s.entries.keySet == Set("json", "0.jpg", "1.jpg"))
  }

  test("unicontrol: exactly (source, target); wrong arity rejected") {
    val s = PackStage.buildSample(10, Seq("s.png", "t.png"), "make it",
      opts(Unicontrol), media)
    val j = json(s)
    assert(j.contains("\"source\":\"000000010-0\""))
    assert(j.contains("\"target\":\"000000010-1\""))
    assert(j.contains("\"prompt\":\"make it\""))
    assertThrows[IllegalArgumentException](
      PackStage.buildSample(11, Seq("only.png"), "x", opts(Unicontrol), media))
  }

  test("flattenForWrite: json first, numeric siblings in order, any ext") {
    val s = graft.wds.Sample("k", "", Map(
      "json" -> "{}".getBytes(UTF_8),
      "10.jpg" -> Array[Byte](1), "2.jpg" -> Array[Byte](2),
      "0.mp4" -> Array[Byte](3)))
    val flat = PackStage.flattenForWrite(s)
    assert(flat.head.entries.keySet == Set("json"))
    assert(flat.tail.map(_.key) == Seq("k-0", "k-2", "k-10"))
  }
}
